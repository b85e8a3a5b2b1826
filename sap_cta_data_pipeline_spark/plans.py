"""Plan introspection — the engine's public window into what Catalyst
actually planned, so scale properties are checkable programmatically
(tests/test_plans.py asserts on these; a 100 TB deployment would gate CI
on them the same way).

`digest(df)` summarizes the physical plan into the facts that matter at
scale: how many exchanges (shuffles) and of what kind, which joins
broadcast, what reached the parquet scan (pushed filters / partition
filters / read schema), whether a top-k avoided a global sort, and
whether any window runs unpartitioned.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (explain() only prints)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@dataclass
class PlanDigest:
    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    n_reused_exchanges: int = 0
    n_single_partition: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_cartesian: int = 0
    n_hash_aggregates: int = 0
    n_sort_aggregates: int = 0
    take_ordered: bool = False
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    global_windows: int = 0
    scan_locations: list[str] = field(default_factory=list)

    def scans_path(self, fragment: str) -> bool:
        """True when any file-source scan location contains ``fragment``
        — the changed-files-only pins assert which files a plan opens
        (note: explain truncates long path lists, so use this only on
        plans with metadata-sized location sets)."""
        return any(fragment in loc for loc in self.scan_locations)

    @property
    def shuffle_free(self) -> bool:
        return self.n_exchanges == 0


def digest(df: DataFrame) -> PlanDigest:
    simple = plan_text(df, "simple")
    formatted = plan_text(df, "formatted")
    # A shuffle exchange node renders as "Exchange <partitioning>"; the
    # word also occurs inside "BroadcastExchange" (no shuffle — a broadcast)
    # and "ReusedExchange" (a reference, not a new shuffle), so anchor the
    # match so it is not preceded by a letter.  shuffle_free therefore means
    # "no shuffle", not "no data movement of any kind" — broadcast counts
    # are reported separately.
    d = PlanDigest(
        n_exchanges=len(re.findall(r"(?<![A-Za-z])Exchange ", simple)),
        n_broadcast_exchanges=simple.count("BroadcastExchange "),
        n_reused_exchanges=simple.count("ReusedExchange "),
        n_single_partition=simple.count("Exchange SinglePartition"),
        n_broadcast_joins=simple.count("BroadcastHashJoin"),
        n_sortmerge_joins=simple.count("SortMergeJoin"),
        n_cartesian=simple.count("CartesianProduct")
        + simple.count("BroadcastNestedLoopJoin"),
        n_hash_aggregates=simple.count("HashAggregate"),
        n_sort_aggregates=simple.count("SortAggregate"),
        take_ordered="TakeOrderedAndProject" in simple,
    )
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted):
        if m.group(1).strip():
            d.pushed_filters.append(m.group(1).strip())
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted):
        if m.group(1).strip():
            d.partition_filters.append(m.group(1).strip())
    for m in re.finditer(r"ReadSchema: (\S+)", formatted):
        d.read_schemas.append(m.group(1))
    for m in re.finditer(r"Location: \w+(?:\([^)]*\))?\s*\[([^\]]*)\]", formatted):
        d.scan_locations.append(m.group(1))
    # a window spec whose partition list is empty funnels everything into
    # one partition — the WindowExec single-partition warning, statically
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", simple):
        args = m.group(1)
        # partition columns precede the first ordering spec (ASC/DESC)
        head = re.split(r"\b(?:ASC|DESC)\b", args)[0]
        if "," not in head.strip().rstrip(",") and (
            "ASC" in args or "DESC" in args
        ):
            first = args.split(",")[0]
            if "ASC" in first or "DESC" in first:
                d.global_windows += 1
    return d
