"""Edge-semantics units for the round-1 addendum operators: window-edge
truncation in low-pass cleaning, pivot null-filling, split determinism."""

from __future__ import annotations

import pandas as pd

from sap_cta_data_pipeline_spark.engine import Engine
from sap_cta_data_pipeline_spark.registry import QUERIES


def test_lowpass_edge_frames_truncate(spark, tmp_path):
    """At vector edges the ±2 moving average runs over 3–4 cells, not 5 —
    a crafted spike at pos 0 must smooth against only its right
    neighbors."""
    emb = [1.0] + [0.0] * 63
    df = spark.createDataFrame(
        [(0, emb, 0)], "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = QUERIES["pipe_clean_lowpass"](spark, str(tmp_path)).collect()[0]
    # pos0 window = cells {0,1,2} → mean 1/3 ≥ 0.1 keep; pos1 = {0..3} →
    # 0.25 keep; pos2 = {0..4} → 0.2 keep; pos3 = {1..5} → 0 drop
    assert out.n_kept == 3
    assert out.kept_energy == 1.0  # only the spike cell carries energy


def test_pivot_fills_missing_combos(spark, sf_dir):
    """Every (priority, status) cell is present and zero-filled — a
    priority with no 'P' orders must show 0, not null."""
    pdf = QUERIES["agg_pivot"](spark, sf_dir).toPandas()
    assert not pdf[["F", "O", "P", "F_rev", "O_rev", "P_rev"]].isna().any().any()
    assert set(pdf.columns) == {"o_orderpriority", "F", "O", "P", "F_rev", "O_rev", "P_rev"}


def test_unpivot_row_multiplicity(spark, sf_dir):
    pdf = QUERIES["project_unpivot"](spark, sf_dir).toPandas()
    per_metric = pdf.groupby("metric").size()
    assert set(per_metric.index) == {"quantity", "price", "discount"}
    assert per_metric.nunique() == 1  # same row count per metric


def test_split_deterministic_and_partitioned(spark, sf_dir):
    a = QUERIES["split_train_test"](spark, sf_dir).toPandas().sort_values("doc_id")
    b = QUERIES["split_train_test"](spark, sf_dir).toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    counts = a["split"].value_counts(normalize=True)
    # multiplicative hash of a dense id range lands near 80/10/10
    assert 0.7 < counts.get("train", 0) < 0.9
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    # each doc appears exactly once — a split must partition the corpus
    assert a["doc_id"].is_unique


def test_ivf_probe_shape(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    pdf = eng.run("sim_ann_ivf").toPandas()
    assert (pdf.groupby("probe_id").size() <= 5).all()
    assert (pdf["probe_id"] != pdf["cand_id"]).all()
