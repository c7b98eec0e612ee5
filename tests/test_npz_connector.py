"""Batch-mode npz connector contracts (read/write halves).

The streaming halves are pinned in test_streaming.py; these pin the
batch writer's append/overwrite commit discipline and the reader's
manifest integrity checking (ADVICE r5: append clobbered part-00000
shards; a partially populated directory read without checking the
manifest it was written with).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _register(spark):
    from fawac_cdc_spark.sources.npz_source import NpzDataSource

    spark.dataSource.register(NpzDataSource)


def _write(spark, pdf: pd.DataFrame, path: str, mode: str) -> None:
    (
        spark.createDataFrame(pdf, schema=SCHEMA)
        .repartition(2)
        .write.format("d4rl_npz")
        .mode(mode)
        .option("path", path)
        .save()
    )


def _read(spark, path: str) -> pd.DataFrame:
    return (
        spark.read.format("d4rl_npz")
        .schema(SCHEMA)
        .option("path", path)
        .load()
        .toPandas()
    )


def _events(lo: int, hi: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_id": range(lo, hi),
            "user_id": [i % 7 for i in range(lo, hi)],
            "event_type": ["click"] * (hi - lo),
            "value": [float(i) for i in range(lo, hi)],
        }
    )


def test_append_mode_preserves_prior_shards(spark, tmp_path):
    """mode('append') must number new shards after the existing max part
    index and merge the manifest — never os.replace over a committed
    shard of the same name."""
    _register(spark)
    out = str(tmp_path / "npz_append")
    _write(spark, _events(0, 100), out, "overwrite")
    _write(spark, _events(100, 250), out, "append")

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 250
    assert len(manifest["shards"]) == len(set(manifest["shards"])) == 4

    got = _read(spark, out)
    assert sorted(got["event_id"]) == list(range(250))


def test_overwrite_mode_replaces_prior_shards(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "npz_over")
    _write(spark, _events(0, 100), out, "overwrite")
    _write(spark, _events(100, 150), out, "overwrite")
    got = _read(spark, out)
    assert sorted(got["event_id"]) == list(range(100, 150))


def test_reader_errors_on_manifest_listed_missing_shard(spark, tmp_path):
    """A shard the manifest lists but the directory lacks is corruption,
    not an empty read."""
    _register(spark)
    out = str(tmp_path / "npz_missing")
    _write(spark, _events(0, 50), out, "overwrite")
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        victim = json.load(f)["shards"][0]
    os.remove(os.path.join(out, victim))
    with pytest.raises(Exception, match="missing shard"):
        _read(spark, out)


def test_reader_errors_on_directory_with_no_manifest_and_no_shards(spark, tmp_path):
    """A directory with neither _MANIFEST.json nor part-*.npz (e.g. a
    streaming-sink output whose data lives under batch-*/) must error,
    not silently read as zero rows."""
    _register(spark)
    out = tmp_path / "npz_wrongdir"
    out.mkdir()
    (out / "batch-00000").mkdir()
    with pytest.raises(Exception, match="not an npz dataset directory"):
        _read(spark, str(out))


def test_append_to_manifestless_directory_counts_prior_rows(spark, tmp_path):
    """Appending to a directory that has shards but no manifest must
    adopt the shards AND count their rows, keeping n_rows consistent
    with the merged shard list."""
    _register(spark)
    out = str(tmp_path / "npz_adopt")
    _write(spark, _events(0, 80), out, "overwrite")
    os.remove(os.path.join(out, "_MANIFEST.json"))
    _write(spark, _events(80, 100), out, "append")
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["n_rows"] == 100
    got = _read(spark, out)
    assert sorted(got["event_id"]) == list(range(100))


def test_reader_returns_zero_rows_for_empty_committed_write(spark, tmp_path):
    """A committed write where every task had zero rows leaves a manifest
    listing no shards — that reads as an empty frame, not a failure."""
    _register(spark)
    out = str(tmp_path / "npz_empty")
    _write(spark, _events(0, 10).iloc[:0], out, "overwrite")
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        assert json.load(f) == {"shards": [], "n_rows": 0}
    got = _read(spark, out)
    assert len(got) == 0
    assert list(got.columns) == ["event_id", "user_id", "event_type", "value"]
