"""§2 round-8 batch EL — deterministic random walks + Markov
absorption time.

- ``graph_random_walks_deterministic``: the walk-corpus generator under
  node2vec/DeepWalk-style graph embeddings, made REPRODUCIBLE: at step
  t a walker at node n moves to its (1 + Knuth(n·31 + t) mod deg(n))-th
  neighbor in neighbor-id order — the deterministic stand-in for the
  uniform random choice, so both engines (and any two cluster runs)
  emit the SAME walk corpus. Six steps from a sampled start set over
  the co-purchase graph.
- ``events_markov_absorption_time``: expected steps to conversion — the
  absorbing-chain question behind 'how far is this user from buying':
  transition probabilities from consecutive-event pairs, 'purchase'
  absorbing, and the truncated Neumann recursion
  t⁽ᵏ⁺¹⁾ = 1 + Q·t⁽ᵏ⁾ (K = 20) instead of a matrix inverse — the
  horizon-bounded expectation that also stays finite when some users
  never convert (documented truncation semantics; both engines run the
  identical recursion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query
from .graph_ops import _EDGE_CTE, _edges

_KNUTH = 2654435761
_M32 = 4294967296
_STEPS = 6
_ABSORB_K = 20


def _walk_oracle() -> str:
    ctes = [
        "ud AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e"
        " UNION ALL SELECT v AS node, u AS nbr FROM e)",
        "ranked AS MATERIALIZED (SELECT node, nbr,"
        " row_number() OVER (PARTITION BY node ORDER BY nbr) AS idx,"
        " count(*) OVER (PARTITION BY node) AS deg FROM ud)",
        "w0 AS MATERIALIZED (SELECT node AS start, node, 0 AS step"
        " FROM (SELECT DISTINCT node FROM ud) WHERE node % 7 = 0)",
    ]
    prev = "w0"
    for s in range(1, _STEPS + 1):
        ctes.append(
            f"""w{s} AS MATERIALIZED (
      SELECT p.start, r.nbr AS node, {s} AS step
      FROM {prev} p JOIN ranked r
        ON r.node = p.node
       AND r.idx = 1 + (((p.node * 31 + {s}) * {_KNUTH}) % {_M32}
                        + {_M32}) % {_M32} % r.deg
    )"""
        )
        prev = f"w{s}"
    union = " UNION ALL ".join(
        f"SELECT start, step, node FROM w{s}" for s in range(_STEPS + 1)
    )
    return (
        f"WITH {_EDGE_CTE}, "
        + ",\n".join(ctes)
        + f""",
    trail AS ({union})
    SELECT CAST(start AS BIGINT) AS start,
           CAST(step AS BIGINT) AS step,
           CAST(node AS BIGINT) AS node
    FROM trail
    """
    )


@query("graph_random_walks_deterministic", oracle=_walk_oracle())
def graph_random_walks_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-6 deterministic walks from every 7th node of the
    co-purchase graph: the step-t move is to the
    (1 + Knuth(node·31 + t) mod degree)-th neighbor in neighbor-id
    order — hash-driven choice instead of rand(), so walk corpora are
    bit-reproducible across engines, runs, and cluster layouts (the
    property DeepWalk pipelines need for cacheable shards). Emits the
    full (start, step, node) trail; the hash-uniformity of the chosen
    neighbor index is pinned in tests along with edge-validity of every
    hop.

    Scale: each step is ONE keyed join against the ranked-neighbor
    frame (walkers × 1 edge lookup) — walk generation is embarrassingly
    parallel in walkers and never materializes more than the frontier;
    the ranked frame is the only corpus-scale build (one window over
    edges)."""
    e = _edges(spark, sf_dir)
    ud = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    wrank = Window.partitionBy("node").orderBy("nbr")
    wdeg = Window.partitionBy("node")
    ranked = ud.select(
        "node",
        "nbr",
        F.row_number().over(wrank).alias("idx"),
        F.count(F.lit(1)).over(wdeg).alias("deg"),
    ).localCheckpoint()
    frontier = (
        ranked.select("node")
        .distinct()
        .filter(F.col("node") % 7 == 0)
        .select(F.col("node").alias("start"), F.col("node").alias("node"))
    )
    trail = frontier.select("start", F.lit(0).alias("step"), "node")
    cur = frontier
    for s in range(1, _STEPS + 1):
        pick = 1 + F.pmod(
            F.pmod((F.col("node") * 31 + s) * _KNUTH, F.lit(_M32)),
            F.col("deg"),
        )
        nxt = (
            cur.join(ranked, "node")
            .filter(F.col("idx") == pick)
            .select("start", F.col("nbr").alias("node"))
        )
        trail = trail.unionAll(nxt.select("start", F.lit(s).alias("step"), "node"))
        cur = nxt
    return trail.select(
        bi(F.col("start")).alias("start"),
        bi(F.col("step")).alias("step"),
        bi(F.col("node")).alias("node"),
    )


def _absorb_oracle() -> str:
    ctes = [
        """seqd AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    )""",
        """trans AS MATERIALIZED (
      SELECT event_type AS src, nxt AS dst,
             count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY event_type)
                 AS p
      FROM seqd WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    )""",
        """q AS MATERIALIZED (
      SELECT src, dst, p FROM trans
      WHERE src <> 'purchase' AND dst <> 'purchase'
    )""",
        """states AS MATERIALIZED (
      SELECT DISTINCT src AS state FROM q
    )""",
        "t0 AS MATERIALIZED (SELECT state, 0.0 AS t FROM states)",
    ]
    prev = "t0"
    for k in range(1, _ABSORB_K + 1):
        ctes.append(
            f"""t{k} AS MATERIALIZED (
      SELECT s.state, 1.0 + coalesce(acc.v, 0) AS t
      FROM states s LEFT JOIN (
        SELECT q.src AS state, sum(q.p * p.t) AS v
        FROM q JOIN {prev} p ON p.state = q.dst GROUP BY q.src
      ) acc ON acc.state = s.state
    )"""
        )
        prev = f"t{k}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT t{_ABSORB_K}.state,
           round(t{_ABSORB_K}.t, 6) AS expected_steps,
           round(coalesce(ab.p_absorb, 0), 6) AS p_convert_1step
    FROM t{_ABSORB_K}
    LEFT JOIN (SELECT src AS state, sum(p) AS p_absorb FROM trans
               WHERE dst = 'purchase' GROUP BY src) ab
      ON ab.state = t{_ABSORB_K}.state
    """
    )


@query("events_markov_absorption_time", oracle=_absorb_oracle())
def events_markov_absorption_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected steps to conversion per current event type: transition
    probabilities from consecutive same-user event pairs, 'purchase'
    absorbing, and the K = 20 truncated Neumann recursion
    t ← 1 + Q·t (t₀ = 0) in place of the fundamental-matrix inverse —
    the horizon-bounded expectation (≈ expected steps within 20 moves),
    which stays finite even when part of the chain never absorbs and
    needs nothing beyond keyed joins. Also reports the one-step
    conversion probability. The recursion is replayed in python in
    tests (monotonicity in K and the fixed-point inequality pinned).

    Scale: the transition matrix is event-type × event-type (≤25
    cells — metadata) after ONE user-ordered window pass over events;
    all 20 iterations run on that frame."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    wsrc = Window.partitionBy("event_type")
    trans = (
        seqd.groupBy("event_type", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("event_type").alias("src"),
            F.col("nxt").alias("dst"),
            (F.col("c") * 1.0 / F.sum("c").over(wsrc)).alias("p"),
        )
    )
    # the transition matrix is event_type × event_type (≤ 25 cells —
    # bounded by construction, the pivot-discovery class), so the K
    # recursion runs on a DRIVER LITERAL instead of 20 four-row Spark
    # jobs; the DuckDB oracle still runs the full unrolled recursion,
    # so the hash certifies the same trajectory.
    cells = trans.collect()  # ≤ |event types|² rows
    states = sorted(
        {c.src for c in cells if c.src != "purchase"}
    )
    qm = {
        (c.src, c.dst): c.p
        for c in cells
        if c.src != "purchase" and c.dst != "purchase"
    }
    p1 = {
        c.src: c.p for c in cells if c.dst == "purchase" and c.src != "purchase"
    }
    tv = {s: 0.0 for s in states}
    for _ in range(_ABSORB_K):
        tv = {
            s: 1.0 + sum(qm.get((s, d), 0.0) * tv[d] for d in states)
            for s in states
        }
    rows = [
        (s, round(tv[s], 6), round(p1.get(s, 0.0), 6)) for s in states
    ]
    return spark.createDataFrame(
        rows, "state string, expected_steps double, p_convert_1step double"
    )
