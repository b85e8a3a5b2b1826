"""Unit pins for the round-2 batch-T operators (Spark 4.x type/SQL
surfaces + span dedup + containment + grouped-map pandas)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return QUERIES[key](spark, sf_dir)

    return run


def test_variant_shred_counts(q, spark, sf_dir):
    rows = q("json_variant_shred").collect()
    ev = load_table(spark, sf_dir, "events")
    expect = ev.filter(F.get_json_object("props", "$.k").cast("long") >= 10).count()
    assert sum(r.n for r in rows) == expect
    # '$.missing' is absent from every props object → n_missing == n per group
    assert all(r.n_missing == r.n for r in rows)
    assert all(r.max_k >= 10 for r in rows)


def test_group_by_all_matches_explicit(q, spark, sf_dir):
    got = [tuple(r) for r in q("sql_group_by_all").collect()]
    o = load_table(spark, sf_dir, "orders")
    expect = [
        tuple(r)
        for r in o.groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"), "o_orderstatus"
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_year", "o_orderstatus")
        .collect()
    ]
    assert got == expect


def test_collation_group_merges_case_variants(q, spark, sf_dir):
    rows = q("fn_collation_group").collect()
    n_part = load_table(spark, sf_dir, "part").count()
    assert sum(r.n for r in rows) == n_part
    assert all(r.ptype_ci == r.ptype_ci.lower() for r in rows)
    # alternating-case synthesis makes ≥1 group carry both variants
    assert all(1 <= r.n_case_variants <= 2 for r in rows)
    assert any(r.n_case_variants == 2 for r in rows)
    # groups are distinct case-insensitively
    keys = [r.ptype_ci for r in rows]
    assert len(keys) == len(set(keys))


def test_listagg_ordered_deterministic(q):
    rows = q("agg_listagg_ordered").collect()
    assert len(rows) == 5 and sum(r.n_nations for r in rows) == 25
    for r in rows:
        names = r.nations_csv.split(",")
        assert names == sorted(names) and len(names) == r.n_nations


def test_span_dedup_vs_python(q, spark, sf_dir):
    got = {r.doc_id: r for r in q("text_span_dedup").collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    # full recompute in Python: global span occurrence counts first
    from collections import Counter, defaultdict

    cnt: Counter = Counter()
    docset: defaultdict = defaultdict(set)
    spans_by_doc = {}
    for d in docs:
        toks = [x for x in d.text.split(" ") if x]
        spans = [" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)]
        spans_by_doc[d.doc_id] = spans
        for s in spans:
            cnt[s] += 1
            docset[s].add(d.doc_id)
    assert set(got) == set(spans_by_doc)
    for doc_id, spans in spans_by_doc.items():
        r = got[doc_id]
        assert r.n_spans == len(spans)
        assert r.n_dup_spans == sum(1 for s in spans if cnt[s] > 1)
        assert r.n_cross_doc_spans == sum(1 for s in spans if len(docset[s]) > 1)
        expect_frac = (r.n_dup_spans / r.n_spans) if r.n_spans else 0.0
        assert r.dup_frac == pytest.approx(expect_frac, abs=1e-6)


def test_containment_vs_python(q, spark, sf_dir):
    got = {(r.doc_a, r.doc_b): r for r in q("dedup_containment").collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    toksets = {d.doc_id: (d.lang, {x for x in d.text.split(" ") if x}) for d in docs}
    expect = {}
    for a, (la, sa) in toksets.items():
        for b, (lb, sb) in toksets.items():
            if a == b or la != lb:
                continue
            inter = len(sa & sb)
            if inter / len(sa) >= 0.9:
                expect[(a, b)] = (len(sa), inter)
    assert set(got) == set(expect)
    for k, (n_a, inter) in expect.items():
        assert (got[k].n_a, got[k].n_common) == (n_a, inter)
        assert got[k].containment == pytest.approx(inter / n_a, abs=1e-6)
    # asymmetry: containment is directional — a perfect subset pairs one way
    # unless the sets are identical (then both directions appear)
    for (a, b), r in got.items():
        if r.containment == 1.0 and (b, a) in got and got[(b, a)].containment == 1.0:
            la, sa = toksets[a]
            lb, sb = toksets[b]
            assert sa == sb


def test_grouped_standardize_moments(q, spark, sf_dir):
    import statistics

    rows = q("udf_grouped_standardize").collect()
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    # z-scores: group mean ≈ 0, sample std ≈ 1 for every group with n > 1
    zs: dict = {}
    for r in rows:
        zs.setdefault(r.event_type, []).append(r.z)
    for et, zvals in zs.items():
        assert len(zvals) == len(by_type[et])
        if len(zvals) > 1:
            assert statistics.fmean(zvals) == pytest.approx(0.0, abs=1e-4)
            assert statistics.stdev(zvals) == pytest.approx(1.0, abs=1e-3)
    # spot-check one row against the direct formula
    et0 = ev[0].event_type
    mean = statistics.fmean(by_type[et0])
    std = statistics.stdev(by_type[et0])
    expect = round((ev[0].value - mean) / std, 6)
    got = {r.event_id: r.z for r in rows if r.event_type == et0}
    assert got[ev[0].event_id] == pytest.approx(expect, abs=1e-5)


def test_pipe_syntax_matches_classic(q, spark, sf_dir):
    got = [tuple(r) for r in q("sql_pipe_syntax").collect()]
    li = load_table(spark, sf_dir, "lineitem")
    expect = [
        tuple(r)
        for r in li.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
        .orderBy("l_returnflag")
        .collect()
    ]
    assert got == expect


def test_parameterized_constant_folded(q):
    rows = q("sql_parameterized").collect()
    assert len(rows) >= 1 and all(r.total > 0 and r.n > 0 for r in rows)


def test_conversion_latency_vs_python(q, spark, sf_dir):
    row = q("events_conversion_latency").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts").collect()
    first_view: dict = {}
    for r in ev:
        if r.event_type == "view":
            if r.user_id not in first_view or r.ts < first_view[r.user_id]:
                first_view[r.user_id] = r.ts
    lat = {}
    for r in ev:
        if r.event_type == "purchase" and r.user_id in first_view and r.ts >= first_view[r.user_id]:
            d = (r.ts - first_view[r.user_id]).total_seconds()
            if r.user_id not in lat or d < lat[r.user_id]:
                lat[r.user_id] = d
    assert row.n_viewers == len(first_view)
    assert row.n_converted == len(lat)
    assert row.conv_rate == pytest.approx(len(lat) / len(first_view), abs=1e-6)
    if lat:
        import statistics

        assert row.avg_latency_s == pytest.approx(statistics.fmean(lat.values()), abs=1e-4)
        assert row.min_latency_s == pytest.approx(min(lat.values()), abs=1e-6)
        assert row.max_latency_s == pytest.approx(max(lat.values()), abs=1e-6)


def test_recall_eval_bounds_and_truth(q):
    rows = q("sim_recall_eval").collect()
    assert len(rows) == 10  # one per probe
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.recall_at_5 == pytest.approx(r.n_hits / 5.0, abs=1e-6)
    # the LSH lane must find at least some true neighbors overall
    assert sum(r.n_hits for r in rows) > 0


def test_phash_dedup_planted_copies_found(q, spark, sf_dir):
    rows = q("multimodal_phash_dedup").collect()
    emb = load_table(spark, sf_dir, "embeddings")
    planted_ids = {
        r.vec_id
        for r in emb.filter((F.col("label").cast("int") % 3 == 0) & (F.col("vec_id") % 7 == 0))
        .select("vec_id")
        .collect()
    }
    got_pairs = {(r.asset_a, r.asset_b) for r in rows}
    # every planted re-encode must be recovered: the +0.5 f4 perturbation of
    # one pixel flips at most 1 dHash bit, and bands 1-3 stay identical
    for vid in planted_ids:
        assert (vid, vid + 1000000) in got_pairs, f"planted copy of {vid} missed"
    assert all(0 <= r.hamming <= 8 for r in rows)


def test_phash_dedup_no_all_pairs(q):
    import contextlib
    import io

    df = q("multimodal_phash_dedup")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_binaryfile_content_fidelity(q, spark, sf_dir):
    import zlib

    from sap_cta_data_pipeline_spark.functions.multimodal import synthesize_media
    from sap_cta_data_pipeline_spark.operators.sources import _scratch

    q("source_binaryfile_scan")  # materializes the files + runs the scan
    expect = {
        r.asset_id: zlib.crc32(bytes(r.payload))
        for r in synthesize_media(spark, sf_dir)
        .filter(F.col("media_type") == "image")
        .select("asset_id", "payload")
        .collect()
    }
    scanned = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "asset_*.bin")
        .load(_scratch(sf_dir, "binary_assets"))
        .select("path", "content")
        .collect()
    )
    got = {}
    for r in scanned:
        aid = int(r.path.rsplit("asset_", 1)[1].split(".bin")[0])
        got[aid] = zlib.crc32(bytes(r.content))
    assert got == expect  # byte-for-byte round trip, every asset


def test_binary_codec_known_digest(q, spark, sf_dir):
    import base64
    import hashlib

    rows = {r.doc_id: r for r in q("fn_binary_codec").collect()}
    assert all(r.roundtrip_ok for r in rows.values())
    docs = {d.doc_id: d.text for d in load_table(spark, sf_dir, "documents").collect()}
    # digests and encodings against hashlib/base64 ground truth, every doc
    for doc_id, text in docs.items():
        r = rows[doc_id]
        b = text.encode()
        assert r.text_md5 == hashlib.md5(b).hexdigest()
        assert r.text_sha256 == hashlib.sha256(b).hexdigest()
        assert r.head_hex == b[:8].hex()
        assert r.head_b64 == base64.b64encode(b[:12]).decode()
        assert r.n_bytes == len(b)


def test_incremental_dedup_vs_python(q, spark, sf_dir):
    rows = {r.doc_id: r for r in q("dedup_incremental_exact").collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    fp = {
        d.doc_id: " ".join(sorted({x for x in d.text.split(" ") if x})) for d in docs
    }
    corpus = {}
    for did in sorted(fp):
        if did % 2 == 0:
            corpus.setdefault(fp[did], did)
    seen_batch: dict = {}
    for did in sorted(fp):
        if did % 2 == 1:
            r = rows[did]
            in_corpus = fp[did] in corpus
            assert r.dup_of_corpus == in_corpus
            assert r.corpus_keeper == (corpus.get(fp[did]) if in_corpus else None)
            within = fp[did] in seen_batch
            assert r.dup_within_batch == within
            assert r.keep == (not in_corpus and not within)
            seen_batch.setdefault(fp[did], did)
    assert set(rows) == {d for d in fp if d % 2 == 1}
    # the planted exact-dup clusters guarantee both dup kinds exist
    assert any(r.dup_of_corpus for r in rows.values())
    assert any(r.keep for r in rows.values())


def test_keep_best_picks_highest_quality(q):
    rows = q("dedup_keep_best").collect()
    assert rows, "corpus has planted exact-dup groups"
    qual = {r.doc_id: r.quality for r in q("text_quality_score").collect()}
    for r in rows:
        dropped = [int(x) for x in r.dropped_csv.split(",") if x]
        assert r.n_members == 1 + len(dropped)
        assert r.keeper not in dropped
        # the keeper's quality is >= every dropped member's
        for d in dropped:
            assert qual[r.keeper] >= qual[d]
        assert r.keeper_quality == pytest.approx(qual[r.keeper], abs=1e-6)


def test_pit_features_no_leakage(q, spark, sf_dir):
    rows = {r.event_id: r for r in q("ml_pit_features").collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    ).collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    import statistics

    checked = 0
    for uid, lst in list(by_user.items())[:50]:
        lst.sort(key=lambda r: (r.ts, r.event_id))
        for r in lst:
            if r.event_type != "purchase":
                continue
            # strictly-before window: same-timestamp peers excluded
            prior = [
                x
                for x in lst
                if x.ts < r.ts and (r.ts - x.ts).total_seconds() <= 604800
            ]
            got = rows[r.event_id]
            assert got.n_prior_7d == len(prior)
            views = [x.value for x in prior if x.event_type == "view"]
            if views:
                assert got.avg_prior_view_value == pytest.approx(
                    statistics.fmean(views), abs=1e-4
                )
            else:
                assert got.avg_prior_view_value is None
            checked += 1
    assert checked > 50


def test_purge_tombstones_reconciles(q, spark, sf_dir):
    rows = q("events_purge_tombstones").collect()
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    from collections import Counter

    before = Counter(r.event_type for r in ev)
    purged = Counter(r.event_type for r in ev if r.user_id % 97 == 0)
    for r in rows:
        assert r.n_before == r.n_after + r.n_purged
        assert r.n_before == before[r.event_type]
        assert r.n_purged == purged[r.event_type]
    assert sum(r.n_purged for r in rows) > 0  # the tombstone list is non-empty


def test_skew_profile_vs_python(q, spark, sf_dir):
    rows = q("profile_join_key_skew").collect()
    from collections import Counter

    o = load_table(spark, sf_dir, "orders").select("o_custkey").collect()
    cnt = Counter(r.o_custkey for r in o)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.heavy_key, r.key_rows) for r in rows] == top
    skew = max(cnt.values()) / (sum(cnt.values()) / len(cnt))
    assert rows[0].skew_factor == pytest.approx(skew, abs=1e-5)
    assert all(r.n_keys == len(cnt) for r in rows)


def test_boolean_aggs_vs_python(q, spark, sf_dir):
    rows = {r.event_type: r for r in q("agg_boolean_every_any").collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by: dict = {}
    for r in ev:
        by.setdefault(r.event_type, []).append(r.value)
    for et, vals in by.items():
        r = rows[et]
        assert r.all_positive == all(v > 0.0 for v in vals)
        assert r.any_large == any(v > 99.0 for v in vals)
        assert r.n_over_50 == sum(1 for v in vals if v > 50.0)
        assert r.n == len(vals)
