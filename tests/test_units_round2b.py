"""Edge-semantics unit tests for the round-2 batch-B operators
(SURVEY.md §5.2.3): crafted graphs for connected components, invariants
for packing / normalization / funnel / profiling / fuzzy matching that
the corpus-level oracle comparison can't pin by itself."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.operators.matching import connected_components
from sap_cta_data_pipeline_spark.registry import QUERIES


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_cc_chain_needs_multiple_rounds(spark):
    """A 5-node chain (diameter 4) must fully converge to the min label —
    pins that propagation iterates to the fixpoint, not one round."""
    nodes = spark.createDataFrame([(i,) for i in range(10, 15)], "node long")
    edges = _sym(spark, [(10, 11), (11, 12), (12, 13), (13, 14)])
    got = {r.node: r.comp for r in connected_components(nodes, edges).collect()}
    assert got == {i: 10 for i in range(10, 15)}


def test_cc_multiple_components_and_isolates(spark):
    """Two separate components + an isolated node keep distinct labels."""
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 8, 99]], "node long")
    edges = _sym(spark, [(2, 3), (1, 2), (7, 8)])
    got = {r.node: r.comp for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 99: 99}


def test_cluster_cc_consistent_with_exact_dedup(spark, sf_dir):
    """Every exact-duplicate group (n_dups > 1) must appear inside some
    cluster: cluster doc counts ≥ exact-dup counts, and each cluster's
    comp_id is the minimum of its rep list."""
    clusters = QUERIES["dedup_cluster_cc"](spark, sf_dir).collect()
    assert clusters, "pathological corpus must produce at least one cluster"
    total_exact_dups = (
        QUERIES["dedup_exact"](spark, sf_dir).agg(F.sum("n_dups")).collect()[0][0]
    )
    assert sum(r.n_docs for r in clusters) >= total_exact_dups
    for r in clusters:
        reps = [int(x) for x in r.rep_ids_csv.split(",")]
        assert r.comp_id == min(reps)
        assert r.n_reps == len(reps)


def test_pack_sequences_invariants(spark, sf_dir):
    rows = QUERIES["pack_sequences_greedy"](spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.offset_in_bin < 512
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        # bin ids are nondecreasing in layout order and start at 0
        assert rs[0].bin_id == 0 and rs[0].offset_in_bin == 0
        for a, b in zip(rs, rs[1:]):
            assert b.bin_id >= a.bin_id
        # reconstruct: each doc starts where the previous ended
        cum = 0
        for r in rs:
            assert r.bin_id * 512 + r.offset_in_bin == cum
            cum += r.n_tok


def test_text_normalize_output_is_clean(spark, sf_dir):
    rows = QUERIES["text_normalize"](spark, sf_dir).select("norm_text").collect()
    for r in rows:
        s = r.norm_text
        assert re.fullmatch(r"[a-z0-9]+( [a-z0-9]+)*", s), s


def test_funnel_counts_monotone(spark, sf_dir):
    rows = {r.step: r.n_users for r in QUERIES["events_funnel_steps"](spark, sf_dir).collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"] > 0


def test_profile_invariants(spark, sf_dir):
    rows = QUERIES["profile_table"](spark, sf_dir).collect()
    assert len(rows) == 5
    n_rows = {r.n_rows for r in rows}
    assert len(n_rows) == 1  # one scan, one row count
    for r in rows:
        assert 0 <= r.n_nulls <= r.n_rows
        assert 0 < r.n_distinct <= r.n_rows
        # typed lanes are exclusive
        numeric = r.min_num is not None
        stringy = r.min_str is not None
        assert numeric != stringy


def test_fuzzy_pairs_within_bounds(spark, sf_dir):
    rows = QUERIES["join_fuzzy_levenshtein"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.name_a < r.name_b
        assert 1 <= r.dist <= 3
        assert abs(len(r.name_a) - len(r.name_b)) <= r.dist


def test_schema_evolution_null_lane(spark, sf_dir):
    rows = QUERIES["scan_schema_evolution"](spark, sf_dir).collect()
    nulls = [r for r in rows if r.name_len is None]
    filled = [r for r in rows if r.name_len is not None]
    assert len(nulls) == len(filled) == len(rows) // 2
    for r in filled:
        assert r.name_len == len(r.r_name)


def test_lateral_topn_agrees_with_window_formulation(spark, sf_dir):
    """The decorrelated LATERAL must equal the explicit window top-k."""
    from pyspark.sql import Window

    lateral = QUERIES["sql_lateral_topn"](spark, sf_dir)
    from sap_cta_data_pipeline_spark.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    window_form = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
    )
    got = sorted(map(tuple, lateral.collect()))
    want = sorted(map(tuple, window_form.collect()))
    assert got == want


def test_except_all_multiplicity(spark):
    """Bag semantics on a crafted frame: multiplicities subtract, never
    go negative, and intersect keeps the min count."""
    a = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], "x long")
    b = spark.createDataFrame([(1,), (2,), (2,)], "x long")
    assert sorted(r.x for r in a.exceptAll(b).collect()) == [1, 1, 3]
    assert sorted(r.x for r in a.intersectAll(b).collect()) == [1, 2]


def test_recursive_calendar_contiguous(spark, sf_dir):
    """The recursive month series is gap-free and spans exactly the
    latest order year up to its max month."""
    rows = sorted(
        QUERIES["sql_recursive_cte"](spark, sf_dir).collect(),
        key=lambda r: r.month,
    )
    months = [r.month for r in rows]
    year = months[0][:4]
    assert months == [f"{year}-{m:02d}" for m in range(1, len(months) + 1)]
    assert all(r.n_orders >= 0 for r in rows)


def test_udtf_windows_cover_tokens(spark, sf_dir):
    """Every probe doc's windows tile its token stream: first window
    starts the doc, strides are 4, the last window reaches the end."""
    rows = QUERIES["udtf_token_windows"](spark, sf_dir).collect()
    docs: dict[int, list] = {}
    for r in rows:
        docs.setdefault(r.doc_id, []).append(r)
    assert docs
    for doc_id, rs in docs.items():
        rs.sort(key=lambda r: r.win_idx)
        assert [r.win_idx for r in rs] == list(range(len(rs)))
        # reconstruct the token count from the final window, then every
        # window's size must be exactly min(8, n - 4*idx)
        n = 4 * rs[-1].win_idx + rs[-1].n_tok
        for r in rs:
            assert r.n_tok == min(8, n - 4 * r.win_idx)
            assert len([x for x in r.win_text.split(" ") if x]) == r.n_tok


def test_compaction_file_count_and_clustering(spark, sf_dir):
    """Compaction must actually reduce file count (64 → ≤4 data files)
    and keep every row; the ts ranges of compacted files must not
    overlap (range clustering)."""
    import glob
    import os

    from sap_cta_data_pipeline_spark.catalog import load_table
    from sap_cta_data_pipeline_spark.operators.sources import _scratch

    out = QUERIES["sink_compact_files"](spark, sf_dir)
    assert out.count() == load_table(spark, sf_dir, "events").count()
    frag_files = glob.glob(os.path.join(_scratch(sf_dir, "events_fragmented"), "part-*"))
    comp_files = glob.glob(os.path.join(_scratch(sf_dir, "events_compacted"), "part-*"))
    assert len(frag_files) == 64
    assert 1 <= len(comp_files) <= 4
    ranges = []
    for f in sorted(comp_files):
        mm = (
            spark.read.parquet(f)
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
            .collect()[0]
        )
        ranges.append((mm.lo, mm.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "compacted files must be non-overlapping in ts"
