"""Custom Python DataSource: D4RL-style dict-of-arrays (.npz) ingest.

The reference's native input format is a dict of equal-length numpy
arrays (``load_d4rl_dataset``, reference ``fawac.py:56-73`` A1, fetched
by ``env.get_dataset()`` ``train_fawac_iql.py:56`` A37). This connector
ingests that format through Spark 4's Python DataSource API — the
idiomatic way to register a new source so it composes with the whole
engine (``spark.read.format("d4rl_npz")``, works under filters,
projections, joins, AQE).

Scale shape: ``partitions()`` splits the row range into even chunks, so
the scan parallelizes like any splittable source; each task emits Arrow
``RecordBatch``es (zero row-at-a-time Python). A production build would
back this with per-chunk files or an object-store range read instead of
re-opening the archive per task — the partition/batch plumbing is
identical.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..catalog import load_table
from ..operators.helpers import money
from ..registry import register

N_SCAN_PARTITIONS = 8


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _EmptyPartition(InputPartition):
    """Placeholder for a committed-but-empty dataset (manifest lists no
    shards): yields zero rows so the scan still returns an empty frame."""

    def __init__(self):
        self.empty = True


class NpzDataSourceReader(DataSourceReader):
    def __init__(self, schema, options):
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]

    def partitions(self):
        import glob
        import json

        import numpy as np

        if os.path.isdir(self.path):
            # Sharded layout produced by the writer: one partition/shard.
            # The shard list comes from _MANIFEST.json when present so a
            # partially populated directory is integrity-checked against
            # the commit that wrote it (a listed-but-missing shard is an
            # error, and an all-empty-task write — zero shards — reads as
            # zero rows instead of "no partitions") (ADVICE r5).
            manifest = os.path.join(self.path, "_MANIFEST.json")
            if os.path.exists(manifest):
                with open(manifest) as f:
                    names = json.load(f).get("shards", [])
                paths = [os.path.join(self.path, n) for n in names]
                missing = [p for p in paths if not os.path.exists(p)]
                if missing:
                    raise FileNotFoundError(
                        f"_MANIFEST.json lists missing shard(s): {missing}"
                    )
                if not paths:
                    return [_EmptyPartition()]
                return [_ShardPartition(p) for p in paths]
            shard_paths = sorted(
                glob.glob(os.path.join(self.path, "part-*.npz"))
            )
            if not shard_paths:
                # no manifest AND no shards: this is the wrong directory
                # (e.g. a streaming-sink output whose data lives under
                # batch-*/), not a committed-empty dataset — only a
                # manifest listing zero shards may read as empty
                raise FileNotFoundError(
                    f"{self.path}: no _MANIFEST.json and no part-*.npz "
                    "shards — not an npz dataset directory"
                )
            return [_ShardPartition(p) for p in shard_paths]
        with np.load(self.path, allow_pickle=False) as data:
            n = len(data[self.columns[0]])
        per = (n + N_SCAN_PARTITIONS - 1) // N_SCAN_PARTITIONS
        return [
            _RangePartition(i * per, min((i + 1) * per, n))
            for i in range(N_SCAN_PARTITIONS)
            if i * per < n
        ]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa

        if isinstance(partition, _EmptyPartition):
            return
        if isinstance(partition, _ShardPartition):
            yield _read_npz_shard(partition.path, self.columns)
            return
        with np.load(self.path, allow_pickle=False) as data:
            arrays = [
                pa.array(data[c][partition.start : partition.end])
                for c in self.columns
            ]
        yield pa.RecordBatch.from_arrays(arrays, names=self.columns)


class NpzDataSource(DataSource):
    """``spark.read.format("d4rl_npz").schema(...).option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "d4rl_npz"

    def reader(self, schema) -> DataSourceReader:
        return NpzDataSourceReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        return NpzDataSourceArrowWriter(schema, self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return NpzStreamArrowWriter(schema, self.options)

    def streamReader(self, schema):
        return NpzStreamReader(schema, self.options)


def _npz_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as a dict-of-arrays archive (the reference's
    on-disk shape) for the roundtrip query.

    The cache key includes the source parquet's (mtime_ns, size): if the
    driver regenerates the fixture tables, a stale cached archive would
    silently diverge from the parquet the oracle reads."""
    import numpy as np

    slug = sf_dir.strip("/").replace("/", "_")
    out_dir = os.path.join(tempfile.gettempdir(), "fawac_cdc_spark_io", slug)
    os.makedirs(out_dir, exist_ok=True)
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    path = os.path.join(out_dir, f"events-{st.st_mtime_ns}-{st.st_size}.npz")
    if not os.path.exists(path):
        pdf = (
            load_table(spark, sf_dir, "events")
            .select("event_id", "user_id", "event_type", "value")
            .toPandas()
        )
        np.savez(
            path,
            event_id=pdf["event_id"].to_numpy("int64"),
            user_id=pdf["user_id"].to_numpy("int64"),
            event_type=pdf["event_type"].to_numpy("U"),
            value=pdf["value"].to_numpy("float64"),
        )
    return path


@register(
    "npz_scan_events_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
""",
    tags=("source", "npz", "python-datasource", "reference"),
)
def npz_scan_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dict-of-arrays ingest roundtrip: events exported to the
    reference's .npz shape, read back through the registered custom
    Python data source (partitioned Arrow-batch scan), aggregated. The
    oracle aggregates the parquet view directly, so parity proves the
    connector's fidelity."""
    path = _npz_fixture(spark, sf_dir)
    spark.dataSource.register(NpzDataSource)
    df = (
        spark.read.format("d4rl_npz")
        .schema("event_id bigint, user_id bigint, event_type string, value double")
        .option("path", path)
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(money("value")).cast("double").alias("total_value"),
    )


# --- Python DataSource WRITER (round 5) ------------------------------------
#
# Completes the connector: spark.write.format("d4rl_npz") stages one
# .npz shard per task, then the driver-side commit() atomically renames
# the staged files into place and writes a _MANIFEST — the same
# immutable-files + atomic-commit discipline as the CDC snapshot sink.
# On an object store the rename becomes a manifest-only commit; the
# task/commit split is identical.

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceArrowWriter, WriterCommitMessage


@dataclass
class _NpzShardCommit(WriterCommitMessage):
    staged: str | None
    n_rows: int


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _stage_npz_shard(iterator, path: str, columns: list[str]) -> _NpzShardCommit:
    """Stage one task's Arrow batches as a temp .npz shard (shared by the
    batch and streaming writers — the commit protocols differ, the
    staging does not)."""
    import uuid

    import numpy as np
    import pyarrow as pa

    batches = list(iterator)
    n = sum(b.num_rows for b in batches)
    if n == 0:
        return _NpzShardCommit(staged=None, n_rows=0)
    tbl = pa.Table.from_batches(batches)
    os.makedirs(path, exist_ok=True)
    staged = os.path.join(path, f".staged-{uuid.uuid4().hex}.npz")
    cols = {}
    for c in columns:
        arr = tbl.column(c).to_numpy(zero_copy_only=False)
        if arr.dtype == object:
            # fixed-width unicode, not pickled object arrays — the
            # reader loads with allow_pickle=False
            arr = arr.astype("U")
        cols[c] = arr
    np.savez(staged, **cols)
    return _NpzShardCommit(staged=staged, n_rows=n)


def _read_npz_shard(path: str, columns: list[str]):
    """One shard → one Arrow RecordBatch (shared by both readers)."""
    import numpy as np
    import pyarrow as pa

    with np.load(path, allow_pickle=False) as data:
        arrays = [pa.array(data[c]) for c in columns]
    return pa.RecordBatch.from_arrays(arrays, names=columns)


class NpzDataSourceArrowWriter(DataSourceArrowWriter):
    def __init__(self, schema, options, overwrite: bool):
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        return _stage_npz_shard(iterator, self.path, self.columns)

    def commit(self, messages):
        import glob
        import json

        shards = [m for m in messages if m is not None and m.staged]
        # tasks only create the dir when they stage rows; an all-empty
        # write must still commit a (shardless) manifest
        os.makedirs(self.path, exist_ok=True)
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        prior_names: list[str] = []
        prior_rows = 0
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.npz")):
                os.remove(old)
        else:
            # append mode: new shards number AFTER the existing max part
            # index and the manifest merges, so a second write can never
            # os.replace over a previously committed shard (ADVICE r5).
            if os.path.exists(manifest_path):
                with open(manifest_path) as f:
                    prior = json.load(f)
                prior_names = list(prior.get("shards", []))
                prior_rows = int(prior.get("n_rows", 0))
            else:
                # manifest-less directory (externally created): adopt the
                # existing shards AND count their rows, so the merged
                # manifest's n_rows stays consistent with its shard list
                import numpy as np

                prior_names = sorted(
                    os.path.basename(p)
                    for p in glob.glob(os.path.join(self.path, "part-*.npz"))
                )
                for name in prior_names:
                    with np.load(
                        os.path.join(self.path, name), allow_pickle=False
                    ) as data:
                        prior_rows += len(data[data.files[0]])
        base = (
            max(
                (int(n.removeprefix("part-").removesuffix(".npz")) for n in prior_names),
                default=-1,
            )
            + 1
        )
        names = []
        for i, m in enumerate(sorted(shards, key=lambda m: m.staged)):
            name = f"part-{base + i:05d}.npz"
            os.replace(m.staged, os.path.join(self.path, name))
            names.append(name)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "shards": prior_names + names,
                    "n_rows": prior_rows + sum(m.n_rows for m in shards),
                },
                f,
            )
        os.replace(tmp, manifest_path)

    def abort(self, messages):
        for m in messages:
            if m is not None and m.staged and os.path.exists(m.staged):
                os.remove(m.staged)


@register(
    "npz_write_roundtrip_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
""",
    tags=("sink", "npz", "python-datasource", "reference"),
)
def npz_write_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full WRITE-then-READ roundtrip through the custom Python data
    source: events flow out via ``DataSourceArrowWriter`` (4 parallel
    tasks → 4 staged shards → atomic driver-side commit + manifest) and
    back in via the sharded reader (one partition per shard), then
    aggregate. Parity against the parquet view proves write fidelity —
    values, types, and row multiplicity all survive the format."""
    spark.dataSource.register(NpzDataSource)
    slug = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "fawac_cdc_spark_io", slug, "events_sharded"
    )
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .repartition(4)
        .write.format("d4rl_npz")
        .mode("overwrite")
        .option("path", out)
        .save()
    )
    df = (
        spark.read.format("d4rl_npz")
        .schema("event_id bigint, user_id bigint, event_type string, value double")
        .option("path", out)
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(money("value")).cast("double").alias("total_value"),
    )


# --- Python DataSource STREAMING writer (round 5) --------------------------
#
# The streaming half of the connector: each micro-batch stages shards on
# the executors, and the driver-side commit(batchId) renames them into a
# batch-scoped directory and appends one line to a stream manifest.  The
# batchId in the manifest makes replays idempotent (a re-committed batch
# replaces its own entry, never duplicates it) — exactly-once on top of
# at-least-once task execution, the same contract a Kafka/Delta sink
# implements.

from pyspark.sql.datasource import DataSourceStreamArrowWriter


class NpzStreamArrowWriter(DataSourceStreamArrowWriter):
    def __init__(self, schema, options):
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator):
        return _stage_npz_shard(iterator, self.path, self.columns)

    def commit(self, messages, batchId: int) -> None:
        import json

        shards = [m for m in messages if m is not None and m.staged]
        batch_dir = os.path.join(self.path, f"batch-{batchId:05d}")
        os.makedirs(batch_dir, exist_ok=True)
        names = []
        for i, m in enumerate(sorted(shards, key=lambda m: m.staged)):
            name = f"part-{i:05d}.npz"
            os.replace(m.staged, os.path.join(batch_dir, name))
            names.append(name)
        manifest = os.path.join(self.path, "_STREAM_MANIFEST.json")
        log = {}
        if os.path.exists(manifest):
            with open(manifest) as f:
                log = json.load(f)
        # idempotent replay: a batch re-commit replaces its own entry
        log[str(batchId)] = {
            "dir": f"batch-{batchId:05d}",
            "shards": names,
            "n_rows": sum(m.n_rows for m in shards),
        }
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f)
        os.replace(tmp, manifest)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.staged and os.path.exists(m.staged):
                os.remove(m.staged)


# --- Python DataSource STREAMING reader (round 5) --------------------------
#
# The last quadrant of the connector matrix (batch/stream x read/write):
# tail a sharded npz directory as a stream, fully PARTITIONED — the
# driver reads only the sink's _STREAM_MANIFEST.json (the offset is the
# count of contiguously committed batch ids); every shard the manifest
# lists for the admitted range becomes an InputPartition whose Arrow
# read runs on the executors, exactly like the batch scan.  A checkpoint
# restart replays `partitions(start, end)` for the
# committed-but-unprocessed range, so delivery is exactly-once without
# any driver-side row buffering.
#
# Offsets deliberately do NOT come from listing batch-* directories: the
# writer creates the batch dir and renames shards into it BEFORE the
# atomic manifest replace, so a directory listing can observe a
# half-committed batch (zero or partial shards) and — offsets only
# advance — permanently skip the missing shards.  The manifest is
# os.replace'd only after every shard landed, making it the one
# linearization point a concurrent tailer can trust (ADVICE r5).

from pyspark.sql.datasource import DataSourceStreamReader


class NpzStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.path = options["path"]
        self.columns = [f.name for f in schema.fields]

    def _committed(self) -> list[dict]:
        """Contiguous-from-0 prefix of manifest-committed batches.

        The sink's batch ids are Structured Streaming micro-batch ids
        (monotonic from 0; replays rewrite their own entry), so a gap can
        only mean a concurrent writer mid-commit — admit nothing past it."""
        import json

        manifest = os.path.join(self.path, "_STREAM_MANIFEST.json")
        if not os.path.exists(manifest):
            return []
        with open(manifest) as f:
            log = json.load(f)
        out = []
        for i in range(len(log)):
            entry = log.get(str(i))
            if entry is None:
                break
            out.append(entry)
        return out

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        return {"idx": len(self._committed())}

    def partitions(self, start: dict, end: dict):
        parts = []
        for entry in self._committed()[start["idx"] : end["idx"]]:
            for name in entry["shards"]:
                p = os.path.join(self.path, entry["dir"], name)
                if not os.path.exists(p):
                    raise FileNotFoundError(
                        f"manifest lists shard {p} but it is missing — "
                        "committed batch directory was mutated externally"
                    )
                parts.append(_ShardPartition(p))
        return parts

    def read(self, partition: _ShardPartition):
        yield _read_npz_shard(partition.path, self.columns)

    def commit(self, end: dict) -> None:
        pass
