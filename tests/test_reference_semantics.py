"""Hand-computed pins for the reference's dataflow semantics (SURVEY §5.2.2).

Tiny frames with by-hand expected values so the reference formulas
(A6 discounted cumsum, A7 expectile, A19 TD-target, A49 EWMA, A44
selection) stay pinned independent of the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from fawac_cdc_spark.operators.windows import (
    GAMMA,
    _disc_scan_block,
    _ewma_pdf,
)


def test_discounted_cumsum_hand_computed():
    pdf = pd.DataFrame(
        {
            "user_id": [7, 7, 7],
            "event_id": [0, 1, 2],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
            "value": [1.0, 2.0, 3.0],
        }
    )
    out = _disc_scan_block(pdf).sort_values("event_id")
    # c2 = 3; c1 = 2 + 0.99*3 = 4.97; c0 = 1 + 0.99*4.97 = 5.9203 -> 5.92
    assert out["disc_return"].tolist() == [5.92, 4.97, 3.0]


def test_discounted_cumsum_doubling_scan_equals_sequential_loop():
    rng = np.random.RandomState(7)
    vals = rng.uniform(0, 200, size=777).round(2)
    pdf = pd.DataFrame(
        {
            "user_id": 1,
            "event_id": np.arange(len(vals)),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(np.arange(len(vals)), "min"),
            "value": vals,
        }
    )
    got = _disc_scan_block(pdf)["disc_return"].to_numpy()
    seq = vals.astype("float64").copy()
    for i in range(len(seq) - 2, -1, -1):
        seq[i] = vals[i] + GAMMA * seq[i + 1]
    assert np.max(np.abs(got - np.round(seq + 1e-9, 2))) <= 0.01 + 1e-12


def test_ewma_hand_computed():
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "event_id": [10, 11, 12],
            "rn": [1, 2, 3],
            "value": [1.0, 2.0, 3.0],
        }
    )
    out = _ewma_pdf(pdf).sort_values("rn")
    # s1=1; s2=0.5*1+0.5*2=1.5; s3=0.5*1.5+0.5*3=2.25
    assert out["ewma"].tolist() == [1.0, 1.5, 2.25]


def test_expectile_loss_hand_computed(spark):
    # u in {-1, 2}, tau=0.7: loss = (0.3*1 + 0.7*4) / 2 = 1.55
    df = spark.createDataFrame([(24.0,), (27.0,)], "l_quantity double")
    u = F.col("l_quantity") - F.lit(25.0)
    u2 = (u * u).cast("decimal(18,2)")
    w = F.when(u < 0, F.lit(0.3).cast("decimal(2,1)")).otherwise(
        F.lit(0.7).cast("decimal(2,1)")
    )
    loss = df.agg((F.sum(u2 * w).cast("double") / F.count(F.lit(1))).alias("x")).collect()[0][
        "x"
    ]
    assert loss == pytest.approx(1.55, abs=1e-12)


def test_td_target_hand_computed(spark):
    # target = r + (1-done)*gamma*next_v  (fawac.py:366)
    rows = [(1, 1, 10.0, "view"), (1, 2, 20.0, "error"), (1, 3, 30.0, "view")]
    df = spark.createDataFrame(rows, "user_id int, step int, value double, event_type string")
    w = Window.partitionBy("user_id").orderBy("step")
    done = F.when(F.col("event_type") == "error", 1.0).otherwise(0.0)
    nxt = F.lead("value").over(w)
    out = (
        df.select(
            "step",
            (F.col("value") + F.lit(0.99) * F.coalesce(nxt, F.lit(0.0)) * (F.lit(1) - done))
            .alias("td"),
        )
        .orderBy("step")
        .collect()
    )
    assert [r["td"] for r in out] == pytest.approx([10.0 + 0.99 * 20.0, 20.0, 30.0])


def test_constrained_selection_hand_computed(spark):
    # best = max ret subject to cost < 20; tie-break asc key (A44)
    rows = [(1, 100.0, 25.0), (2, 90.0, 10.0), (3, 90.0, 5.0), (4, 50.0, 1.0)]
    df = spark.createDataFrame(rows, "ckpt int, ret double, cost double")
    best = (
        df.where(F.col("cost") < 20)
        .orderBy(F.desc("ret"), F.asc("ckpt"))
        .limit(1)
        .collect()[0]
    )
    assert best["ckpt"] == 2  # 100.0 excluded by constraint; 90/90 tie -> ckpt 2


def test_disc_scan_stream_carries_partial_episodes():
    """Arrow batch boundaries don't respect episodes: the stream wrapper
    must carry a split episode into the next batch and still compute the
    same scan as one whole-block pass."""
    from fawac_cdc_spark.operators.windows import _disc_scan_stream

    rng = np.random.RandomState(11)
    frames = []
    for uid in (1, 2, 3):
        n = rng.randint(5, 40)
        frames.append(
            pd.DataFrame(
                {
                    "user_id": uid,
                    "event_id": np.arange(n),
                    "ts": pd.to_datetime("2024-01-01")
                    + pd.to_timedelta(np.arange(n), "min"),
                    "value": rng.uniform(0, 100, size=n).round(2),
                }
            )
        )
    full = pd.concat(frames, ignore_index=True)
    want = _disc_scan_block(full).reset_index(drop=True)
    for cut in (1, 7, len(full) // 2, len(full) - 1):
        batches = [full.iloc[:cut], full.iloc[cut:]]
        got = pd.concat(list(_disc_scan_stream(iter(batches))), ignore_index=True)
        pd.testing.assert_frame_equal(got, want)


def test_artifact_inference_matches_literal_weights(spark, tmp_path):
    """Weights loaded from a file artifact + broadcast must score exactly
    like the literal-weight oracle-checked query (A9-A11 checkpoint-load
    semantics)."""
    from fawac_cdc_spark.catalog import load_table
    from fawac_cdc_spark.functions.multimodal import (
        mlp_inference_scores,
        save_model_artifact,
        scores_from_artifact,
    )
    from tests.conftest import SF0001

    path = save_model_artifact(str(tmp_path / "model"))
    emb = load_table(spark, SF0001, "embeddings")
    got = scores_from_artifact(spark, emb, path).toPandas().sort_values("vec_id")
    want = mlp_inference_scores(spark, SF0001).toPandas().sort_values("vec_id")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_artifact_roundtrips_custom_weights(tmp_path):
    from fawac_cdc_spark.functions.multimodal import save_model_artifact

    w = np.arange(64, dtype="float64") / 64.0
    path = save_model_artifact(str(tmp_path / "m2"), w=w, b=0.25)
    with np.load(path) as npz:
        assert np.array_equal(npz["w"], w)
        assert float(npz["b"]) == 0.25
