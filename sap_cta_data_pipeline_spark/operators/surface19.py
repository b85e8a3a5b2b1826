"""§2 round-8 batch DW — spatial encoding + 1-bit embedding search:
geohash encode (from-scratch bit interleave) and binary-quantized
Hamming ANN with exact rerank.

- ``fn_geohash_encode``: the standard geohash (Niemeyer) — quantize
  lat/lon to 15 bits each, interleave lon-first, emit 6 base32 chars.
  Implemented as UNROLLED integer bit arithmetic identical in both
  engines (no format lib on either side); the classic test vector
  (57.64911, 10.40744) → ``u4pruy`` is pinned. Geohash prefixes are the
  textbook spatial bucketing key — the string twin of the numeric grid
  cell in geo_grid_distance_join.
- ``emb_binary_quantize_hamming``: 1-bit quantization — pack
  sign(embedding) into two 32-bit words per vector, probe by Hamming
  distance (bit_count(xor)) over the packed words, keep top-5 per
  probe, then rerank those 5 exactly by cosine. The 64× memory
  reduction + popcount distance is the production first stage for
  billion-vector search (binary quantization as in faiss' IndexBinary);
  the bounded-probe contract matches sim_knn_cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GEO_BITS = 30  # 6 chars × 5 bits: 15 lon + 15 lat, lon first


def _geohash_sql(lat: str, lon: str) -> str:
    """DuckDB expression: geohash6 of (lat, lon) via unrolled integer
    bit arithmetic — bit g (MSB-first) is lon bit 14−g/2 when g is
    even, lat bit 14−(g−1)/2 when odd; chars index the base32 alphabet
    5 bits at a time."""
    latq = f"CAST(floor(({lat} + 90.0) / 180.0 * 32768.0) AS BIGINT)"
    lonq = f"CAST(floor(({lon} + 180.0) / 360.0 * 32768.0) AS BIGINT)"
    chars = []
    for ci in range(6):
        terms = []
        for j in range(5):
            g = ci * 5 + j
            src, pos = (lonq, 14 - g // 2) if g % 2 == 0 else (latq, 14 - (g - 1) // 2)
            terms.append(f"(({src} >> {pos}) & 1) * {1 << (4 - j)}")
        idx = " + ".join(terms)
        chars.append(f"substr('{_B32}', CAST({idx} AS INT) + 1, 1)")
    return " || ".join(chars)


def _geohash_col(lat, lon):
    """Spark twin of :func:`_geohash_sql` — same unrolled arithmetic."""
    latq = F.floor((lat + 90.0) / 180.0 * 32768.0).cast("long")
    lonq = F.floor((lon + 180.0) / 360.0 * 32768.0).cast("long")
    alphabet = F.array(*[F.lit(ch) for ch in _B32])
    chars = []
    for ci in range(6):
        idx = F.lit(0)
        for j in range(5):
            g = ci * 5 + j
            src, pos = (lonq, 14 - g // 2) if g % 2 == 0 else (latq, 14 - (g - 1) // 2)
            idx = idx + F.shiftright(src, pos).bitwiseAND(F.lit(1)) * (1 << (4 - j))
        chars.append(F.element_at(alphabet, idx.cast("int") + 1))
    return F.concat(*chars)


@query(
    "fn_geohash_encode",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey * 7919) % 17000 / 100.0 - 85.0  AS lat,
             (c_custkey * 104729) % 35000 / 100.0 - 175.0 AS lon
      FROM customer
    )
    SELECT c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon,
           {_geohash_sql('lat', 'lon')} AS geohash6
    FROM pts
    """,
)
def fn_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-6 of each customer's (derived) coordinates — the same
    deterministic lat/lon fixture as geo_grid_distance_join, so the two
    lanes bucket the same points. Pure unrolled integer bit arithmetic
    (30 bit extractions + base32 table lookup), bit-identical across
    engines; the canonical vector (57.64911, 10.40744) → ``u4pruy`` is
    pinned in tests together with the prefix-containment property
    (a 6-char geohash cell lies inside its 5-char parent).

    Scale: a pure map-side projection — zero shuffle; the output string
    is the bucketing/sort key that makes spatial locality a PREFIX
    relation, which is what you Z-order or range-partition by at
    100 TB."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 17000 / 100.0 - 85.0).alias("lat"),
        ((F.col("c_custkey") * 104729) % 35000 / 100.0 - 175.0).alias("lon"),
    )
    return c.select(
        "c_custkey",
        r6(F.col("lat")).alias("lat"),
        r6(F.col("lon")).alias("lon"),
        _geohash_col(F.col("lat"), F.col("lon")).alias("geohash6"),
    )


_N_PROBES = 8
_TOP_HAMMING = 5


def _pack_sql(e: str, lo_first: int) -> str:
    """DuckDB: pack sign bits of dims lo_first..lo_first+31 into BIGINT."""
    terms = " + ".join(
        f"(CASE WHEN {e}[{lo_first + k}] > 0 THEN {1 << k} ELSE 0 END)"
        for k in range(32)
    )
    return f"CAST({terms} AS BIGINT)"


def _pack_col(e, lo_first: int):
    # unrolled flat sum — stays inside whole-stage codegen (a
    # higher-order fold here runs interpreted per element and is ~4×
    # slower on the corpus-wide packing pass, measured at sf0.01)
    acc = F.lit(0).cast("long")
    for k in range(32):
        acc = acc + F.when(
            F.element_at(e, lo_first + k) > 0, F.lit(1 << k).cast("long")
        ).otherwise(0)
    return acc


@query(
    "emb_binary_quantize_hamming",
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), packed AS (
      SELECT vec_id,
             {_pack_sql('e', 1)}  AS lo,
             {_pack_sql('e', 33)} AS hi
      FROM v
    ), cand AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
             bit_count(xor(p.lo, c.lo)) + bit_count(xor(p.hi, c.hi))
                 AS hamming
      FROM packed p JOIN packed c
        ON p.vec_id < {_N_PROBES} AND c.vec_id <> p.vec_id
    ), topk AS (
      SELECT probe_id, cand_id, hamming,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY hamming, cand_id) AS rk
      FROM cand
    ), kept AS (
      SELECT * FROM topk WHERE rk <= {_TOP_HAMMING}
    )
    SELECT k.probe_id, k.cand_id,
           CAST(k.hamming AS BIGINT) AS hamming,
           round(list_sum(list_transform(range(1, 65), i -> pe.e[i] * ce.e[i]))
               / (sqrt(list_sum(list_transform(pe.e, x -> x * x)))
                  * sqrt(list_sum(list_transform(ce.e, x -> x * x)))), 6)
               AS cos_sim,
           CAST(k.rk AS BIGINT) AS rk
    FROM kept k
    JOIN v pe ON pe.vec_id = k.probe_id
    JOIN v ce ON ce.vec_id = k.cand_id
    """,
)
def emb_binary_quantize_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit embedding search: sign-quantize each 64-dim vector into two
    packed 32-bit words, compute Hamming distance popcount(xor) from
    each of the first {_N_PROBES} probes to every other vector, keep the
    {_TOP_HAMMING} Hamming-nearest per probe (deterministic (hamming,
    cand_id) order), and attach the EXACT cosine for the kept candidates
    — the rerank that recovers what 1-bit quantization blurs. Packing
    and distance are pure integer arithmetic (engine-identical); cosine
    follows dedup_near_embedding's float→double discipline.

    Scale: the quantized index is 8 BYTES per vector (64× smaller than
    float32) and the distance is two xor+popcnt ops — this is why
    binary quantization is the first stage at billions of vectors. The
    probe×corpus product here rides the bounded-probe contract
    (sim_knn_cosine class); the full-corpus path buckets probes by
    Hamming-ball LSH over the packed words (sim_ann_lsh's banding with
    word prefixes as bands)."""
    v = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    packed = v.select(
        "vec_id",
        _pack_col(F.col("e"), 1).alias("lo"),
        _pack_col(F.col("e"), 33).alias("hi"),
    )
    p = packed.filter(F.col("vec_id") < _N_PROBES).alias("p")
    c = packed.alias("c")
    # Stage 1 — Hamming only: the probe side is _N_PROBES rows, so the
    # probe×corpus product is one broadcast map-side pass over 8-byte
    # codes (no vectors cross this stage, no shuffle).
    cand = c.join(
        F.broadcast(p), F.col("c.vec_id") != F.col("p.vec_id")
    ).select(
        F.col("p.vec_id").alias("probe_id"),
        F.col("c.vec_id").alias("cand_id"),
        (
            F.bit_count(F.col("p.lo").bitwiseXOR(F.col("c.lo")))
            + F.bit_count(F.col("p.hi").bitwiseXOR(F.col("c.hi")))
        ).alias("hamming"),
    )
    wrk = Window.partitionBy("probe_id").orderBy("hamming", "cand_id")
    kept = (
        cand.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= _TOP_HAMMING)
    )
    # Stage 2 — exact rerank on the probes×top-k pairs ONLY (40 rows):
    # re-attach both vectors and compute the true cosine.
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x)
    )
    pe = v.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("p_e")
    )
    ce = v.select(F.col("vec_id").alias("cand_id"), F.col("e").alias("c_e"))
    dot = F.aggregate(
        F.zip_with(F.col("p_e"), F.col("c_e"), lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    kept_pe = kept.join(F.broadcast(pe), "probe_id")
    return (
        ce.join(F.broadcast(kept_pe), "cand_id")
        .select(
            "probe_id",
            "cand_id",
            bi(F.col("hamming")).alias("hamming"),
            r6(dot / (norm(F.col("p_e")) * norm(F.col("c_e")))).alias(
                "cos_sim"
            ),
            bi(F.col("rk")).alias("rk"),
        )
    )
