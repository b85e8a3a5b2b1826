"""§2 round-2 addendum — entity resolution: duplicate clustering and fuzzy
matching.

Pair-finding (dedup_exact / dedup_near_jaccard / dedup_minhash_lsh) emits
EDGES; a production dedup pipeline needs the transitive closure — which
documents form one duplicate CLUSTER, and which single representative
survives. That closure is a connected-components computation:

- dedup_cluster_cc — components over the near-duplicate graph via
  iterative min-label propagation. The iteration count is the graph
  diameter, not the corpus size: each round is one keyed join + one keyed
  min-aggregate over the (reps-sized) label table, all Spark-distributed;
  the only driver traffic is one convergence count per round (the same
  iterative-algorithm lane as pipe_optimize_threshold — but unlike that
  op, the fixpoint here is deterministic and SQL-expressible, so it
  carries a full recursive-CTE value oracle). For web-scale graphs with
  large diameters the drop-in replacement is the large-star/small-star
  algorithm (O(log n) rounds); min-label propagation is the readable
  exact form and converges in ≤ a handful of rounds on near-dup graphs,
  whose components are dense by construction.
- join_fuzzy_levenshtein — edit-distance fuzzy matching on a
  dictionary-sized key domain, with the dedupe-before-quadratic pattern:
  collapse the fact table to DISTINCT names first (2 000 parts → 64
  names), pair the tiny dictionary (broadcast nested-loop is correct and
  cheap at dictionary scale), prefilter by length difference BEFORE
  computing the O(len²) edit distance. At larger dictionary sizes the
  blocking becomes an equi-join key (length band × first character, or
  q-gram inverted index) — the docstring contract names the swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi
from ..registry import query

_JACCARD_T = 0.8
_MAX_CC_ROUNDS = 25

#: Per-task edge budget for the CC loops' shuffles (round 13, measured):
#: every CC round is 5-7 tiny sequential AQE stages, so at small edge
#: counts the wall is pure per-stage scheduling, not compute — the loop
#: DOP is derived from the MEASURED edge count (the loop already counts
#: edges every round via its convergence fingerprint) instead of running
#: each stage at the session's full shuffle width. ~400k 16-byte edge
#: rows per task keeps a task at a few MB / well under a second of hash
#: work; the session's configured width stays the CEILING (we only
#: shrink when the measured state is small — AQE-coalesce philosophy,
#: applied where AQE's own coalescing cannot remove the per-stage
#: replanning cost). Measured on the sf0.1 LSH graph (669k edges /
#: 3.9k nodes): 4.72 s → 2.07 s; on the 10× dup-sparse graph (6.7M
#: edges) DOP 16-32 stays optimal and the rule yields 17.
_CC_EDGES_PER_TASK = 400_000


def _cc_loop_dop(n_edges: int, session_parts: int) -> int:
    return max(1, min((n_edges + _CC_EDGES_PER_TASK - 1) // _CC_EDGES_PER_TASK,
                      session_parts))


#: Round 14 (ADVICE r13): serializes both CC loops' session-global
#: shuffle-width mutation against concurrent/nested CC calls, so a
#: clobbered width can never be "restored" to another loop's transient
#: value. The conf form stays in BOTH loops because the locally-scoped
#: alternative (explicit numbered keyed repartitions on every loop
#: shuffle input) was measured and REJECTED: par in the isolated
#: twostar harness but consistently slower end to end — propagation
#: 3.0-3.5 s → 4.9-5.8 s, dedup_minhash_cluster 4.23 s → 4.8-5.15 s at
#: sf0.1 in both orders — because explicit repartition nodes survive
#: AQE and block the broadcast-join conversions the tiny label/min
#: joins rely on, while the conf width also narrows the aggregates.
#: Residual contract (documented, not lock-fixable): OTHER queries
#: planned concurrently on the same session during a CC loop see the
#: narrowed width — plan concurrent work on a separate session
#: (`spark.newSession()`), which has its own SQLConf.
import threading as _threading  # noqa: E402

_CC_CONF_LOCK = _threading.Lock()


def connected_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Hash-min connected components with pointer jumping: ``nodes`` has
    one ``node`` column, ``edges`` is the SYMMETRIC (src, dst) relation;
    returns (node, comp) with comp = min node id reachable. Each round
    (a) takes the min label over neighbors (hash-min) and (b) shortcuts
    comp ← comp[comp] (pointer jumping), so label chains collapse
    exponentially — rounds ≈ O(log diameter), not diameter (91 s → s at
    sf0.1 for the near-dup graph). Every step is a keyed join/agg over
    the label table, eagerly localCheckpoint-ed so round R's plan stays
    flat instead of nesting R joins deep; one scalar convergence count
    per round crosses the driver — the iterative-algorithm lane."""
    labels = nodes.select("node", F.col("node").alias("comp")).localCheckpoint(
        eager=True
    )
    # loop DOP from the measured edge count (round 13): every round is a
    # chain of tiny sequential stages whose wall at small edge counts is
    # per-stage scheduling, not compute — see _CC_EDGES_PER_TASK. Unlike
    # the two-star loop the edge table here is constant across rounds,
    # so one count at entry (the edges are cached by every caller and
    # round 1 would materialize them anyway) sizes the whole loop.
    # Round 14 (ADVICE r13): the width mutation stays — the
    # locally-scoped repartition variant measured 4.9-5.8 s vs
    # 3.0-3.5 s at sf0.1 (explicit repartitions survive AQE and block
    # its broadcast-join conversions; see _CC_CONF_LOCK) — but it is now
    # serialized under _CC_CONF_LOCK so nested/concurrent CC calls can
    # never restore each other's transient width; the restore is
    # try/finally on every exit path as before.
    spark = edges.sparkSession
    with _CC_CONF_LOCK:
        session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        try:
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(_cc_loop_dop(edges.count(), session_parts)),
            )
            for _ in range(_MAX_CC_ROUNDS):
                prop = (
                    edges.join(labels, edges.src == labels.node)
                    .groupBy("dst")
                    .agg(F.min("comp").alias("nc"))
                )
                stepped = labels.join(prop, labels.node == prop.dst, "left").select(
                    "node",
                    F.least(F.col("comp"), F.coalesce(F.col("nc"), F.col("comp"))).alias("comp"),
                )
                # pointer jump: replace my label by my label's label (comp is
                # monotone non-increasing, so comp[comp] ≤ comp always holds)
                parent = stepped.select(
                    F.col("node").alias("comp"), F.col("comp").alias("jump")
                )
                new_labels = (
                    stepped.join(parent, "comp", "left")
                    .select("node", F.coalesce(F.col("jump"), F.col("comp")).alias("comp"))
                    .localCheckpoint(eager=True)
                )
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "node")
                    .filter(F.col("n.comp") != F.col("o.comp"))
                    .count()
                )
                labels = new_labels
                if changed == 0:
                    break
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(session_parts))
    return labels


#: min-reachable-label fixpoint oracle, shared by BOTH CC lanes — the
#: algorithms differ (propagation rounds vs two-star), the answer cannot.
_CC_ORACLE = """
    WITH RECURSIVE canon AS (
      SELECT doc_id, lang,
             array_to_string(list_sort(list_distinct(
               list_filter(string_split(text, ' '), x -> x != ''))), ' ') AS fp
      FROM documents
    ), groups AS (
      SELECT fp, min(lang) AS lang, min(doc_id) AS rep, count(*) AS n_docs
      FROM canon GROUP BY fp
    ), tok AS (
      SELECT DISTINCT rep AS doc_id, lang, unnest(string_split(fp, ' ')) AS term
      FROM groups
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      FROM tok a JOIN tok b ON a.term = b.term AND a.lang = b.lang
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges0 AS (
      SELECT da, db
      FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
    ), edges AS (
      SELECT da AS src, db AS dst FROM edges0
      UNION ALL
      SELECT db AS src, da AS dst FROM edges0
    ), cc(node, lbl) AS (
      SELECT rep, rep FROM groups
      UNION
      SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.node
    ), comp AS (
      SELECT node, min(lbl) AS comp_id FROM cc GROUP BY node
    )
    SELECT comp.comp_id,
           count(*)                                       AS n_reps,
           CAST(sum(g.n_docs) AS BIGINT)                  AS n_docs,
           array_to_string(list_sort(list(comp.node)), ',') AS rep_ids_csv
    FROM comp JOIN groups g ON g.rep = comp.node
    GROUP BY comp.comp_id
    HAVING sum(g.n_docs) > 1
    """


@query("dedup_cluster_cc", oracle=_CC_ORACLE)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS (not just pairs): exact-dup collapse →
    lang-blocked Jaccard ≥ 0.8 edges between representatives → connected
    components by min-label propagation → per-component roll-up (id = min
    doc_id, member counts incl. exact dups, sorted rep list). Components
    of size 1 with no exact dups are dropped (nothing to deduplicate).

    Distribution contract: every per-round operation is keyed on the node
    id (join + min-agg over the reps-sized label table, edges table
    reused each round from cache); rounds = component diameter; one
    scalar convergence count per round crosses the driver. The oracle is
    the recursive-CTE min-reachable-label fixpoint — identical answer by
    induction on path length."""
    groups, edges = _neardup_graph(spark, sf_dir)
    labels = connected_components(
        groups.select(F.col("rep").alias("node")), edges
    )
    return _cc_rollup(labels, groups)


def _neardup_graph(spark: SparkSession, sf_dir: str):
    """Shared near-dup graph: exact-collapse groups + symmetric Jaccard
    ≥ 0.8 edges between representatives (the dedup_cluster_cc pipeline up
    to the CC step, reused by the two-star variant)."""
    docs = t(spark, sf_dir, "documents")
    fp = F.concat_ws(
        " ",
        F.array_sort(F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))),
    )
    groups = (
        docs.select("doc_id", "lang", fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("lang").alias("lang"),
            F.min("doc_id").alias("rep"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .cache()  # feeds tokenization, the node list, AND the final roll-up
    )
    tok = groups.select(
        F.col("rep").alias("doc_id"), "lang", F.explode(F.split("fp", " ")).alias("term")
    ).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tok.select(F.col("doc_id").alias("da"), "lang", "term")
    b = tok.select(F.col("doc_id").alias("db"), "lang", "term")
    inter = (
        a.join(b, ["lang", "term"])
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    edges0 = (
        inter.join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
        .filter(jac >= _JACCARD_T)
        .select("da", "db")
    )
    edges = edges0.select(F.col("da").alias("src"), F.col("db").alias("dst")).unionAll(
        edges0.select(F.col("db").alias("src"), F.col("da").alias("dst"))
    )
    edges = edges.cache()
    return groups, edges


def _cc_rollup(labels: DataFrame, groups: DataFrame) -> DataFrame:
    """Per-component roll-up shared by both CC lanes."""
    return (
        labels.join(groups.select(F.col("rep").alias("node"), "n_docs"), "node")
        .groupBy(F.col("comp").alias("comp_id"))
        .agg(
            F.count(F.lit(1)).alias("n_reps"),
            F.sum("n_docs").alias("n_docs"),
            F.concat_ws(",", F.array_sort(F.collect_list("node"))).alias("rep_ids_csv"),
        )
        .filter(F.col("n_docs") > 1)
    )


def connected_components_twostar(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 15,
    edges_unique: bool = False,
) -> tuple[DataFrame, int]:
    """Large-star/small-star connected components (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond") — the O(log n)-round
    alternative to min-label propagation for graphs whose component
    DIAMETER is large (web graphs, long duplicate chains): each round
    rewires edges toward local minima (large-star: every neighbor v > u
    connects to min(Γ(u) ∪ {u}); small-star: every neighbor v ≤ u
    likewise), provably preserving connectivity while at least halving
    tall structures, until the graph is a union of stars centered at the
    component minima. Every step is an edge-keyed groupBy + join (no
    label table at all — the edge list IS the state), localCheckpoint-ed
    flat; one scalar convergence fingerprint per round crosses the
    driver. Round-5 rework (profiled at sf0.1: the loop was 9.2 s of
    dedup_minhash_cluster's wall): (a) the edge STATE is canonical
    undirected (hi, lo) — every distinct/checkpoint moves half the rows
    of the old symmetric form, and the directed views each phase needs
    are derived by a shuffle-free union; (b) the fixed-point test is a
    (count, sum, bit_xor)-of-xxhash64 fingerprint — one map-side-combined
    aggregate over the already-checkpointed edges instead of the two
    full exceptAll shuffles per round the old form paid (a false-equal
    needs a simultaneous 64-bit sum AND xor collision at equal counts —
    ~2^-128, far below any hardware error rate; false-unequal is
    impossible, so labels are never wrong, only an infinitesimally
    unlikely extra round saved). Returns (labels(node, comp),
    rounds_used)."""

    def _fp(ec: DataFrame) -> tuple:
        r = ec.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("hi", "lo")).alias("s"),
            F.bit_xor(F.xxhash64("lo", "hi")).alias("x"),
        ).collect()[0]
        return (r.n, r.s, r.x)

    # the input distinct is defensive (duplicate edges never change the
    # result — every step is a min — only the sizes downstream); callers
    # whose edge feed is unique by construction (dedup_minhash_cluster's
    # first-matching-band pairs) skip the corpus-pair shuffle entirely
    edges = edges.select(
        F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
    ).where(F.col("hi") != F.col("lo"))
    if not edges_unique:
        edges = edges.distinct()
    edges = edges.localCheckpoint(eager=True)
    fp = _fp(edges)
    spark = edges.sparkSession
    # Round 14 (ADVICE r13): the width mutation is serialized under
    # _CC_CONF_LOCK (see the lock's comment: the locally-scoped
    # repartition variant was measured and REJECTED — par in the
    # isolated loop harness but +0.6-0.9 s on dedup_minhash_cluster at
    # sf0.1 in both orders, because explicit repartitions survive AQE
    # and block its broadcast-join conversions). The restore stays
    # try/finally on every exit path.
    _CC_CONF_LOCK.acquire()
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rounds = 0
    converged = False
    try:
        for _ in range(max_rounds):
            rounds += 1
            # round DOP from the measured edge count (free: it's fp[0]) —
            # re-derived every round because the edge set collapses
            # geometrically, so round 1 may want the session width while
            # round 3 wants a single task (see _CC_EDGES_PER_TASK)
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(_cc_loop_dop(fp[0], session_parts)),
            )
            # large-star: for each u, m = min(Γ(u) ∪ {u}); emit (v, m) for v > u
            sym = edges.select(F.col("hi").alias("src"), F.col("lo").alias("dst")).unionAll(
                edges.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
            )
            mins = sym.groupBy("src").agg(
                F.least(F.min("dst"), F.col("src")).alias("m")
            )
            ls = (
                sym.join(mins, "src")
                .where(F.col("dst") > F.col("src"))
                .select(F.col("dst").alias("a"), F.col("m").alias("b"))
                .where(F.col("a") != F.col("b"))
            )
            # canonical large-star output doubles as small-star's ≤-neighbor
            # view: (hi, lo) IS the (u, v ≤ u) directed edge set. `down`
            # feeds two sub-trees (mins2 and the join), so it is always
            # checkpointed — round 13 retired the old ≥100k stat gate:
            # with the loop DOP now following the edge count, the extra
            # materialization job is one tiny stage, strictly cheaper
            # than re-running the whole large-star subtree (measured at
            # sf0.1: 4.0 s → 3.3 s before the DOP change, still ahead
            # after it).
            down = ls.select(
                F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
            ).distinct().localCheckpoint(eager=True)
            # small-star: for each u over its ≤-neighbors, m = min; emit
            # (v, m) for every v ∈ Γ⁻(u) and (u, m)
            mins2 = down.groupBy("hi").agg(F.min("lo").alias("m"))
            ss_pairs = (
                down.join(mins2, "hi")
                .select(F.col("lo").alias("a"), F.col("m").alias("b"))
                .unionAll(
                    mins2.select(F.col("hi").alias("a"), F.col("m").alias("b"))
                )
                .where(F.col("a") != F.col("b"))
            )
            new_edges = (
                ss_pairs.select(
                    F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            new_fp = _fp(new_edges)
            edges = new_edges
            if new_fp == fp:
                converged = True
                break
            fp = new_fp
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(session_parts))
        _CC_CONF_LOCK.release()
    if not converged:
        # exhausting max_rounds without a fixed point means the labels
        # below would be WRONG (a star forest was never reached) — fail
        # loudly rather than return silently-incorrect components
        raise RuntimeError(
            f"connected_components_twostar did not converge in {max_rounds} "
            "rounds; raise max_rounds (~log2 of the largest component "
            "suffices)"
        )
    # at the fixed point every (hi, lo) points hi at its component min
    comp = edges.groupBy(F.col("hi").alias("src")).agg(F.min("lo").alias("comp"))
    labels = (
        nodes.join(comp, nodes.node == comp.src, "left")
        .select("node", F.coalesce("comp", F.col("node")).alias("comp"))
    )
    return labels, rounds


@query("dedup_cluster_cc_twostar", oracle=_CC_ORACLE)
def dedup_cluster_cc_twostar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_cluster_cc's exact output (identical oracle) computed with
    the large-star/small-star algorithm instead of min-label
    propagation — the web-scale swap the propagation lane's docstring
    names: rounds scale with log(component size), not diameter, so a
    100 TB duplicate graph with million-node chained components
    converges in ~20 rounds where propagation would need the chain
    length. Same near-dup graph (shared _neardup_graph), same roll-up;
    the round-count advantage is pinned on a planted 64-node chain in
    tests/test_iterative_pins.py (two-star ≤ 7 rounds; per-round label
    propagation without pointer jumping would need 63)."""
    groups, edges = _neardup_graph(spark, sf_dir)
    labels, _ = connected_components_twostar(
        groups.select(F.col("rep").alias("node")), edges
    )
    return _cc_rollup(labels, groups)


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    WITH names AS (
      SELECT p_name, count(*) AS n_parts FROM part GROUP BY p_name
    )
    SELECT a.p_name  AS name_a,
           b.p_name  AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_parts AS n_parts_a,
           b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= 3
     AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-match on part names within edit distance 3 — the
    entity-resolution primitive for typo-grade name variants. Scale shape:
    collapse the fact table to its DISTINCT name dictionary first (one
    combiner-friendly groupBy; 2 000 rows → 64 names here, and name
    dictionaries stay ≪ fact cardinality at any scale), pair the
    dictionary via broadcast nested-loop (correct at dictionary size),
    and gate the O(len²) levenshtein behind the O(1) length-difference
    prefilter (edit distance ≥ length gap, so no matches are lost). For
    dictionaries past broadcast size, the pairing becomes an equi-join on
    blocking keys (length band × prefix, or a q-gram inverted index —
    dedup_ngram_jaccard's join shape) before the same verify."""
    names = (
        t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a"))
    b = names.select(F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 3)
            & (dist <= 3),
        )
        .select("name_a", "name_b", bi(dist).alias("dist"), "n_parts_a", "n_parts_b")
    )


from ..registry import ORACLES as _ORACLES, QUERIES  # noqa: E402  (composition below)


@query(
    "dedup_cluster_size_histogram",
    oracle=f"""
    SELECT n_docs AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(n_docs) AS BIGINT) AS n_docs_in_size
    FROM (
    {_ORACLES["dedup_cluster_cc"]}
    ) clusters
    GROUP BY n_docs
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the report that decides
    dedup POLICY: a corpus whose mass sits in 2-doc clusters needs a
    different keeper strategy than one with a few 200-doc template
    families (dedup_keep_best picks keepers; this says how much each
    choice matters, and its tail is the early-warning for template
    spam). COMPOSES the iterative connected-components op — Spark side
    aggregates QUERIES['dedup_cluster_cc']'s fixpoint, the oracle wraps
    ORACLES['dedup_cluster_cc'] (the recursive CTE) as a derived table —
    the second composed-operator lane after lang_id_confusion_eval, and
    proof the composition pattern also spans ITERATIVE ops when their
    fixpoint carries an oracle. Output is size-grain (bounded by the
    largest family)."""
    clusters = QUERIES["dedup_cluster_cc"](spark, sf_dir)
    return clusters.groupBy(F.col("n_docs").alias("cluster_size")).agg(
        bi(F.count(F.lit(1))).alias("n_clusters"),
        bi(F.sum("n_docs")).alias("n_docs_in_size"),
    )


@query("dedup_cluster_recall_eval")  # rows-only: scores the hash-specific cluster lane
def dedup_cluster_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-LEVEL evaluation of the MinHash dedup clustering against
    the exact-Jaccard ground truth — the clustering-quality twin of the
    pair-level dedup_recall_eval: both clusterings reduce to their
    same-cluster representative PAIRS (the standard pair-counting view
    of a clustering — Rand-index numerators), and the report is pair
    precision/recall of minhash clusters vs exact clusters. This is the
    number that licenses shipping dedup_minhash_cluster's keeper map at
    100 TB: it bounds how many true duplicate pairs the banded
    approximation merges (recall) and how many spurious merges it
    introduces (precision) AFTER transitive closure — which pair-level
    metrics cannot see (one wrong edge can glue two whole clusters).
    Pair expansion is bounded by Σ|cluster|², computed per cluster key
    (both clusterings' components are duplicate families — small by
    construction). 1-row output."""
    from ..registry import QUERIES

    groups, edges = _neardup_graph(spark, sf_dir)
    nodes = groups.select(F.col("rep").alias("node"))
    exact_labels = connected_components(nodes, edges)

    mh = QUERIES["dedup_minhash_cluster"](spark, sf_dir).select(
        F.col("rep_id").alias("node"), F.col("cluster_id").alias("comp")
    )

    def _pairs(labels: DataFrame) -> DataFrame:
        a = labels.select(F.col("comp").alias("c"), F.col("node").alias("pa"))
        b = labels.select(F.col("comp").alias("c"), F.col("node").alias("pb"))
        return (
            a.join(b, "c")
            .filter(F.col("pa") < F.col("pb"))
            .select("pa", "pb")
        )

    # same pair UNIVERSE on both sides: the exact graph is lang-blocked
    # by design, the minhash lane is not — unrestricted comparison would
    # count every true cross-language near-dup against precision (a
    # definition mismatch, not approximation error; measured: precision
    # 0.22 unrestricted vs the same-lang figure reported here)
    lang = groups.select(F.col("rep").alias("node"), "lang")
    la = lang.select(F.col("node").alias("pa"), F.col("lang").alias("lang_a"))
    lb = lang.select(F.col("node").alias("pb"), F.col("lang").alias("lang_b"))

    def _same_lang(pairs: DataFrame) -> DataFrame:
        return (
            pairs.join(F.broadcast(la), "pa")
            .join(F.broadcast(lb), "pb")
            .filter(F.col("lang_a") == F.col("lang_b"))
            .select("pa", "pb")
        )

    pe = _pairs(exact_labels).cache()
    pm = _same_lang(_pairs(mh)).cache()
    n_e = pe.count()
    n_m = pm.count()
    n_common = pe.join(pm, ["pa", "pb"], "left_semi").count()
    return spark.createDataFrame(
        [
            (
                n_e,
                n_m,
                n_common,
                round(n_common / n_e, 6) if n_e else 1.0,
                round(n_common / n_m, 6) if n_m else 1.0,
            )
        ],
        schema="n_pairs_exact bigint, n_pairs_minhash bigint, n_common bigint,"
        " pair_recall double, pair_precision double",
    )
