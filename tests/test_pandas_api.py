"""Pandas API on Spark: the reference notebook's analytics flow.

The reference consumes training curves with pandas (``make_plots.ipynb``
A46-A49: ``pd.read_csv`` → positional column select → tagged multi-source
union → prefix truncation → EWMA α=0.5 smoothing). A notebook user
migrating to this engine keeps that exact code shape on
``pyspark.pandas`` — same API, distributed execution. These tests pin
the pandas-on-Spark flow to plain pandas run on identical input.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def curve_csvs(tmp_path_factory):
    """Two algorithms' (step, value) metric curves, as the notebook's
    per-algorithm CSV pairs (A46-A47)."""
    out = tmp_path_factory.mktemp("curves")
    rng = np.random.RandomState(11)
    paths = {}
    for algo in ("fawac", "fisor"):
        pdf = pd.DataFrame(
            {
                "step": np.arange(40),
                "value": rng.standard_normal(40).round(4).cumsum(),
                "extra": rng.standard_normal(40).round(4),
            }
        )
        p = out / f"{algo}.csv"
        pdf.to_csv(p, index=False)
        paths[algo] = str(p)
    return paths


def _notebook_flow(pd_mod, read_csv, paths):
    """The A46-A49 flow, parameterized by pandas implementation."""
    frames = []
    for algo, path in paths.items():
        df = read_csv(path)
        df = df.iloc[:, [0, 1]]  # A46: positional (step, value) select
        df["algo"] = algo  # A47: tagged union
        if algo == "fisor":
            df = df.iloc[: len(df) // 2 + 1]  # A48: prefix truncation
        # A49: EWMA alpha=0.5 (pandas-default adjusted weighting on both
        # implementations; the reference's seeded recurrence form is
        # oracle-checked separately as ewma_user_values)
        df["smooth"] = df["value"].ewm(alpha=0.5).mean()
        frames.append(df)
    return pd_mod.concat(frames).reset_index(drop=True)


def test_notebook_flow_matches_pandas(spark, curve_csvs):
    warnings.filterwarnings("ignore")
    import pyspark.pandas as ps

    got = (
        _notebook_flow(ps, ps.read_csv, curve_csvs)
        .to_pandas()
        .sort_values(["algo", "step"])
        .reset_index(drop=True)
    )
    want = (
        _notebook_flow(pd, pd.read_csv, curve_csvs)
        .sort_values(["algo", "step"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_merge_asof_matches_manual_asof_join(spark, sf_dir):
    """pandas-on-Spark merge_asof == the engine's manual union+window
    as-of join (asof_join_last_signup_before_purchase)."""
    warnings.filterwarnings("ignore")
    import pyspark.pandas as ps

    from fawac_cdc_spark.registry import all_specs

    want = (
        all_specs()["asof_join_last_signup_before_purchase"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "purchase_ts"])
        .reset_index(drop=True)
    )

    from fawac_cdc_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    purchases = (
        e.where("event_type = 'purchase'")
        .select(
            e.event_id.alias("purchase_id"), "user_id", e.ts.alias("purchase_ts")
        )
        .pandas_api()
    )
    signups = (
        e.where("event_type = 'signup'")
        .select("user_id", e.ts.alias("last_signup_ts"))
        .pandas_api()
    )
    got = (
        ps.merge_asof(
            purchases.sort_values("purchase_ts"),
            signups.sort_values("last_signup_ts"),
            left_on="purchase_ts",
            right_on="last_signup_ts",
            by="user_id",
            allow_exact_matches=True,  # the manual scan is at-or-before
        )
        .to_pandas()
        .sort_values(["user_id", "purchase_ts"])
        .reset_index(drop=True)
    )
    got = got[want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ppm_decoder_is_generic():
    """The P6 parser decodes arbitrary comment-bearing PPM bytes it did
    not generate — it is a real decoder, not a replay of the generator."""
    from fawac_cdc_spark.functions.multimodal import decode_ppm

    raster = bytes(range(2 * 3 * 3))  # 3x2 image, bytes 0..17
    payload = b"P6\n# a comment\n3 2\n# another\n255\n" + raster
    w, h, px = decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert px.shape == (2, 3, 3)
    assert px[0, 0, 0] == 0 and px[1, 2, 2] == 17

    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00")


def test_ppm_pipeline_stage_boundary(spark, sf_dir):
    """The generator stage emits valid standalone PPM files (parseable by
    the generic decoder outside Spark) — pinning the seam where a codec
    library would plug in."""
    from fawac_cdc_spark.functions.multimodal import (
        _ppm_payload_batches,
        decode_ppm,
    )

    pdf = pd.DataFrame({"doc_id": [0, 1, 7, 123]})
    (out,) = list(_ppm_payload_batches(iter([pdf])))
    for doc_id, payload in zip(out["doc_id"], out["payload"]):
        w, h, px = decode_ppm(payload)
        assert (w, h) == (8 + doc_id % 5, 6 + doc_id % 3)
        assert px.shape == (h, w, 3)
        assert px[0, 0, 0] == (doc_id * 7) % 256
