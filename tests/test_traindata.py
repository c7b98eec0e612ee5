"""Hand-computed semantics for the training-data pipeline operators
(oracle parity pins cross-engine equality; these pin the intent)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fawac_cdc_spark.functions.traindata import (
    CHUNK_STRIDE,
    CHUNK_WINDOW,
    PACK_BUDGET,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@pytest.fixture()
def chunk_fn(spark, tmp_path):
    """Run the chunking expression tree against an in-memory docs frame by
    monkey-loading it through a parquet dir shaped like the catalog."""

    def run(rows):
        import fawac_cdc_spark.functions.traindata as td
        from unittest import mock

        df = _docs(spark, rows)
        with mock.patch.object(td, "load_table", lambda s, d, t: df):
            return td.doc_token_chunks(spark, "unused")

    return run


def test_chunking_short_doc_single_chunk(chunk_fn):
    got = chunk_fn([(1, "s", "a b c")]).collect()
    assert len(got) == 1
    assert got[0]["chunk_id"] == 0 and got[0]["n_chunk_tokens"] == 3


def test_chunking_window_boundaries(chunk_fn):
    # 100 tokens, window 64, stride 48 -> chunks at 0 (64 toks) and 48 (52 toks)
    text = " ".join(f"t{i}" for i in range(100))
    got = sorted(chunk_fn([(1, "s", text)]).collect(), key=lambda r: r["chunk_id"])
    assert [(r["chunk_id"], r["n_chunk_tokens"]) for r in got] == [(0, 64), (1, 52)]
    # exact-window doc -> exactly one chunk
    text64 = " ".join(f"t{i}" for i in range(CHUNK_WINDOW))
    got = chunk_fn([(2, "s", text64)]).collect()
    assert [(r["chunk_id"], r["n_chunk_tokens"]) for r in got] == [(0, CHUNK_WINDOW)]
    # window+1 tokens -> two chunks, second holds the tail
    text65 = " ".join(f"t{i}" for i in range(CHUNK_WINDOW + 1))
    got = sorted(chunk_fn([(3, "s", text65)]).collect(), key=lambda r: r["chunk_id"])
    assert [(r["chunk_id"], r["n_chunk_tokens"]) for r in got] == [
        (0, CHUNK_WINDOW),
        (1, CHUNK_WINDOW + 1 - CHUNK_STRIDE),
    ]


def test_chunks_cover_every_token(chunk_fn):
    """Coverage invariant: chunk starts advance by stride < window, so the
    union of [start, start+len) intervals covers [0, ntok)."""
    for ntok in (1, 47, 48, 63, 64, 65, 112, 113, 200):
        text = " ".join(f"t{i}" for i in range(ntok))
        rows = sorted(
            chunk_fn([(1, "s", text)]).collect(), key=lambda r: r["chunk_id"]
        )
        covered = set()
        for r in rows:
            start = r["chunk_id"] * CHUNK_STRIDE
            covered |= set(range(start, start + r["n_chunk_tokens"]))
        assert covered == set(range(ntok)), f"ntok={ntok}"


def _py_pack_shard(doc_id: int) -> int:
    import hashlib

    from fawac_cdc_spark.functions.traindata import N_PACK_SHARDS

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % N_PACK_SHARDS


def test_packing_fills_budget(spark):
    """Shard-aware exact replay: within each (source, pack_shard), docs
    pack in doc_id order by cumsum-before // budget; totals are lossless."""
    import fawac_cdc_spark.functions.traindata as td
    from unittest import mock

    ntok = 600
    rows = [(i, "srcA", " ".join(["x"] * ntok)) for i in range(10)]
    df = _docs(spark, rows)
    with mock.patch.object(td, "load_table", lambda s, d, t: df):
        packs = {
            (r["pack_shard"], r["pack_id"]): (r["n_docs"], r["pack_tokens"])
            for r in td.packed_sequences(spark, "unused").collect()
        }
    # Python replay of the exact semantics (md5 shard, cumsum-before pack).
    expected: dict[tuple[int, int], tuple[int, int]] = {}
    by_shard: dict[int, list[int]] = {}
    for i in range(10):
        by_shard.setdefault(_py_pack_shard(i), []).append(i)
    for shard, ids in by_shard.items():
        before = 0
        for _ in sorted(ids):
            pid = before // td.PACK_BUDGET
            n, t = expected.get((shard, pid), (0, 0))
            expected[(shard, pid)] = (n + 1, t + ntok)
            before += ntok
    assert packs == expected
    assert sum(n for n, _ in packs.values()) == 10
    assert sum(t for _, t in packs.values()) == 10 * ntok


def test_hash_split_is_deterministic_and_complete(spark, sf_dir):
    from fawac_cdc_spark.functions.traindata import dataset_hash_split

    a = dataset_hash_split(spark, sf_dir).toPandas()
    b = dataset_hash_split(spark, sf_dir).toPandas()
    assert sorted(map(tuple, a.values.tolist())) == sorted(
        map(tuple, b.values.tolist())
    )
    by_split = a.groupby("split")["n_docs"].sum()
    total = by_split.sum()
    # 80/10/10 within generous tolerance on a small fixture
    assert by_split["train"] / total > 0.6
    assert set(by_split.index) <= {"train", "val", "test"}
