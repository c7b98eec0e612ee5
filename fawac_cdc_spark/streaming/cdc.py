"""Structured Streaming CDC pipelines (SURVEY.md §2 M6, BASELINE north_star).

The events table is the CDC stream: ``readStream`` file source →
watermark → windowed/stateful operators → ``foreachBatch`` upsert
materialization. Batch equivalents live in ``streaming/batch_equiv.py``
(oracle-checked); ``tests/test_streaming.py`` asserts stream-batch parity.

Reference anchors:
- micro-batch orchestration (``fawac.py:521-551`` — A32) → trigger loop
- EWMA soft target update (``fawac.py:15-17`` — A17) → ``soft_update_run``
- episode accumulation (``fawac.py:597-611`` — A35) → ``session_window``
- checkpoint serialize/restore (``fawac.py:555-583`` — A33) → versioned
  snapshot state dirs + streaming checkpointLocation

Scale notes: every pipeline keys its state by user_id/event_type so the
state store partitions horizontally; watermarks bound state size; the
upsert sink writes versioned snapshots (swap-on-commit) — the plain-
parquet stand-in for Delta/Iceberg MERGE.

On-ingest dedup/selection gates — WHICH VARIANT TO USE (round 14,
VERDICT r13 #6).  Each family ships two forms.  **Default to the
``*_watermarked`` variant**: it buffers per key/bucket until the
event-time watermark closes, so arrival order never changes the
admitted set and the stream provably matches the batch query under
ANY shuffled feed.  The legacy un-suffixed form is the lower-latency
fast path that admits on FIRST ARRIVAL; it equals the batch semantics
ONLY when the feed delivers candidates in monotone id order (exact
contract in each function's docstring) — safe for replaying an ordered
log or a monotonically-keyed CDC topic, wrong for multi-producer /
shuffled ingestion.

| family (admit rule)             | default                            | legacy fast path safe when             | stream==batch pinned by (tests/test_streaming.py) |
|---------------------------------|------------------------------------|----------------------------------------|-----------------------------------------------------|
| LSH near-dup gate               | ``lsh_dedup_stream_watermarked``   | doc_id-ordered feed                     | ``test_lsh_dedup_watermarked_matches_batch_under_shuffled_arrival`` (+ ``_drops_beyond_delay``); legacy: ``test_lsh_dedup_stream_matches_batch`` |
| semantic (SemDeDup cell) gate   | ``semantic_dedup_stream_watermarked`` | vec_id-ordered feed                  | ``test_semantic_dedup_watermarked_matches_batch_under_shuffled_arrival`` (+ ``_drops_beyond_delay``); legacy: ``test_semantic_dedup_stream_matches_batch`` |
| token-budget selection gate     | ``token_budget_stream_watermarked``| admission-order == batch order feed     | ``test_token_budget_watermarked_matches_batch_under_shuffled_arrival`` (+ ``_drops_beyond_delay``); legacy: ``test_token_budget_stream_matches_batch`` |
| duplicated-span excision gate   | ``span_dedup_stream_watermarked``  | doc_id-ordered feed (first-seen spans)  | ``test_span_dedup_watermarked_matches_batch_under_shuffled_arrival`` (+ ``_drops_beyond_delay``); legacy: ``test_span_dedup_stream_matches_batch`` |

The ``streaming/batch_equiv.py`` closed forms mirror the BATCH
semantics both variants converge to; their docstrings point back at
the watermarked twin.
"""

from __future__ import annotations

import decimal
import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.helpers import money


def _money_cents(v) -> int:
    """Money double → integer cents with SQL HALF_UP semantics.

    Matches the batch oracles' ``CAST(value AS DECIMAL(18,2))`` exactly
    (decimal-over-str, ROUND_HALF_UP). Python's ``round()`` is banker's
    rounding and would diverge on a value whose double is exactly half a
    cent — unreachable with the 2-decimal money fixtures, but the stateful
    ops must not depend on that fixture precondition."""
    return int(
        decimal.Decimal(str(v)).quantize(
            decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
        )
        * 100
    )

# Schema handed to readStream (file sources require one). Matches the
# catalog contract: events.ts already converted to TIMESTAMP_NTZ micros
# by the chunk-writer (tests) or upstream ingestion.
EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-stream source over a directory of event parquet chunks.

    ``maxFilesPerTrigger=1`` makes each chunk one micro-batch — the local
    stand-in for a Kafka/CDC feed's incremental arrival."""
    return (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); event time is the NTZ wall
    clock cast in the session zone (pinned UTC in session.py), cast back
    to NTZ on emit so outputs match the batch equivalents."""
    return events.withColumn("ts_ltz", F.col("ts").cast("timestamp"))


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup (batch equiv: hourly_event_rollup)."""
    return (
        _with_event_time(events)
        .withWatermark("ts_ltz", watermark)
        .groupBy(F.window("ts_ltz", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_first_stream(events: DataFrame, watermark: str = "30 days") -> DataFrame:
    """Stateful keep-first dedup on (user_id, event_type) with BOUNDED
    state: ``dropDuplicatesWithinWatermark`` keeps the first arrival per
    key and — unlike plain ``dropDuplicates``, whose per-key state lives
    forever even while the key keeps arriving — expires a key's dedup
    state once the watermark passes its event time, so the state store
    size tracks the watermark horizon instead of the all-time key
    cardinality.  Duplicates are only guaranteed dropped when they arrive
    within the watermark delta of the first event — the honest contract
    for an unbounded CDC feed (batch equiv: stream_dedup_first_event,
    exact on any finite replay shorter than the horizon)."""
    return (
        _with_event_time(events)
        .withWatermark("ts_ltz", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
        )
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows — the reference's episode abstraction (A35).

    (batch equiv: session_agg_30min_gap, modulo the closed/open boundary
    at an exact-gap arrival)."""
    return (
        _with_event_time(events)
        .withWatermark("ts_ltz", "1 day")
        .groupBy(F.session_window("ts_ltz", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )


# --- CDC upsert materialization (foreachBatch + incremental snapshots) -----
#
# The snapshot is hash-bucketed on the merge key and committed via
# per-version manifests, so a micro-batch rewrites ONLY the buckets its
# keys hash into — O(touched-bucket bytes) per batch instead of O(total
# state) — while untouched buckets stay byte-identical on disk (the new
# manifest re-references their existing files).  This is the plain-parquet
# emulation of Delta/Iceberg MERGE + transaction log (SURVEY §4.2.2):
# data files are immutable, a commit is one atomic manifest rename, and
# readers resolve the newest manifest to a file list.  At 100 TB the
# bucket count is sized so one bucket ≈ one executor-comfortable rewrite
# (e.g. 4096 buckets over 100 TB ≈ 25 GB/bucket).

N_STATE_BUCKETS = 16


def _latest_per_key(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )


def _bucket_col(n_buckets: int) -> F.Column:
    return F.pmod(F.hash(F.col("user_id")), F.lit(n_buckets)).cast("int")


def _state_versions(state_dir: str) -> list[int]:
    """Committed manifest epochs, ascending."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if d.startswith("v") and d.endswith(".json") and d[1:-5].isdigit():
            out.append(int(d[1:-5]))
    return sorted(out)


def _read_manifest(state_dir: str, version: int | None = None) -> dict[str, str]:
    """bucket id (str) -> state_dir-relative data directory.

    ``version`` selects a specific committed epoch (time travel); default
    is the newest commit."""
    versions = _state_versions(state_dir)
    if not versions:
        return {}
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(f"no committed version {version}; have {versions}")
    with open(os.path.join(state_dir, f"v{version}.json")) as f:
        return json.load(f)["buckets"]


def _commit_manifest(state_dir: str, epoch_id: int, buckets: dict[str, str]) -> None:
    """Atomic swap-on-commit: write sidecar, rename into place."""
    import json

    path = os.path.join(state_dir, f"v{epoch_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch_id, "buckets": buckets}, f, sort_keys=True)
    os.replace(tmp, path)


def read_upsert_state(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame | None:
    """Read a committed snapshot (A33 restore semantics): resolve the
    manifest — newest by default, or any committed epoch via ``version``
    (time travel; data files are immutable, so every historical manifest
    stays readable until its epochs are vacuumed)."""
    buckets = _read_manifest(state_dir, version)
    if not buckets:
        return None
    paths = [os.path.join(state_dir, rel) for rel in buckets.values()]
    return spark.read.parquet(*paths)


def write_state_snapshot(
    df: DataFrame, state_dir: str, epoch_id: int, n_buckets: int = N_STATE_BUCKETS
) -> None:
    """Batch-mode FULL-snapshot commit through the SAME manifest machinery
    the streaming upsert sink uses: ``df`` is the complete state, so the
    committed manifest references ONLY this epoch's buckets (unlike the
    incremental `cdc_upsert_run` MERGE, which carries untouched buckets
    forward) — carrying previous buckets here would resurrect keys absent
    from ``df``, which is neither snapshot nor upsert semantics.
    ``read_upsert_state(version=...)`` time travel then works identically
    whether an epoch came from a micro-batch or a batch job (the
    Delta/Iceberg snapshot-commit shape).  Epoch ids are immutable:
    reusing a committed id would overwrite data files older manifests
    still reference, so that is refused loudly.  The touched-bucket
    collect runs on the RAW keys (no window job; bounded by n_buckets)."""
    if epoch_id in _state_versions(state_dir):
        raise ValueError(
            f"epoch {epoch_id} already committed in {state_dir}; epochs are "
            "immutable — pick an unused id (see state_versions())"
        )
    epoch_rel = f"data/e{epoch_id}"
    _latest_per_key(df).withColumn("bucket", _bucket_col(n_buckets)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(state_dir, epoch_rel))
    touched = sorted(
        r["bucket"]
        for r in df.select(_bucket_col(n_buckets).alias("bucket"))
        .distinct()
        .collect()
    )
    manifest = {str(k): f"{epoch_rel}/bucket={k}" for k in touched}
    _commit_manifest(state_dir, epoch_id, manifest)


def state_versions(state_dir: str) -> list[int]:
    """Public list of committed snapshot epochs, ascending (time travel)."""
    return _state_versions(state_dir)


def cdc_upsert_run(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    n_buckets: int = N_STATE_BUCKETS,
) -> DataFrame:
    """Run the CDC upsert pipeline to completion over a finite stream.

    Each micro-batch MERGEs into the latest-per-user state incrementally:
    bucket the batch keys, read ONLY the previously committed data of the
    touched buckets, keep the newest row per key, write those buckets to
    an epoch-scoped directory, and commit a manifest that re-references
    every untouched bucket's existing files unchanged.  Returns the final
    materialized state.
    """
    events = read_event_stream(spark, source_dir)

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        manifest = _read_manifest(state_dir)
        batch = batch_df.withColumn("bucket", _bucket_col(n_buckets))
        touched = sorted(
            r["bucket"] for r in batch.select("bucket").distinct().collect()
        )
        if not touched:
            _commit_manifest(state_dir, epoch_id, manifest)
            return
        prev_paths = [
            os.path.join(state_dir, manifest[str(k)])
            for k in touched
            if str(k) in manifest
        ]
        merged = batch
        if prev_paths:
            prev = sess.read.parquet(*prev_paths).withColumn(
                "bucket", _bucket_col(n_buckets)
            )
            merged = prev.unionByName(batch)
        epoch_rel = f"data/e{epoch_id}"
        (
            _latest_per_key(merged)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(state_dir, epoch_rel))
        )
        new_manifest = dict(manifest)
        for k in touched:
            new_manifest[str(k)] = f"{epoch_rel}/bucket={k}"
        _commit_manifest(state_dir, epoch_id, new_manifest)

    q = (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = read_upsert_state(spark, state_dir)
    assert final is not None, "no micro-batches processed"
    return final.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


# --- A17: EWMA soft-update of an aggregate state ---------------------------


def soft_update_run(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    tau: float = 0.1,
) -> dict[str, float]:
    """Streaming soft update: ``target = (1 - tau) * target + tau * batch_mean``
    per event_type — the reference's target-network EWMA merge
    (``soft_update``, ``fawac.py:15-17``, A17) as incremental state over
    micro-batches. Returns the final target values.
    """
    events = read_event_stream(spark, source_dir)
    target: dict[str, float] = {}

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        means = (
            batch_df.groupBy("event_type")
            .agg((F.sum(money("value")).cast("double") / F.count(F.lit(1))).alias("m"))
            .collect()
        )
        for row in means:
            k, m = row["event_type"], row["m"]
            target[k] = m if k not in target else (1 - tau) * target[k] + tau * m

    q = (
        events.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return dict(target)


# --- A17 EWMA as a DISTRIBUTED stateful operator (transformWithState) ------
#
# ``soft_update_run`` above mirrors the reference's driver-side scalar
# state (fine at ≤5 keys, noted ceiling).  This is the horizontally
# scalable form: the EWMA target lives in per-key VALUE STATE inside the
# state store (partitioned by event_type, checkpointed, rocksdb-backed on
# a real cluster), updated through Spark 4's transformWithStateInPandas —
# no driver round-trip, any key cardinality.

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("target", T.DoubleType()),
        T.StructField("n_batches", T.LongType()),
    ]
)


def ewma_target_stream(events: DataFrame, tau: float = 0.1) -> DataFrame:
    """``target = (1 - tau) * target + tau * batch_mean`` per event_type
    (reference ``soft_update``, ``fawac.py:15-17``, A17) with the target
    held in keyed value state.  Means are computed over integer cents so
    the recurrence is float-exact vs the sequential replay.

    NOTE: transformWithStateInPandas requires pyspark's protobuf
    dependency at runtime; the parity test skips where it is absent
    (this container) and runs on any standard pyspark install.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ewma", "target double, n_batches bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            cents = 0
            n = 0
            for pdf in rows:
                cents += int(pdf["value"].map(_money_cents).sum())
                n += len(pdf)
            if n == 0:
                return iter(())
            mean = (cents / 100.0) / n
            prev = self._state.get() if self._state.exists() else None
            if prev is None:
                target, batches = mean, 1
            else:
                target, batches = (1 - tau) * prev[0] + tau * mean, prev[1] + 1
            self._state.update((target, batches))
            yield pd.DataFrame(
                {"event_type": [key[0]], "target": [target], "n_batches": [batches]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=EwmaProcessor(),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("target", T.DoubleType()),
        T.StructField("n_batches", T.LongType()),
    ]
)


def ewma_target_stream_gs(events: DataFrame, tau: float = 0.1) -> DataFrame:
    """Same EWMA recurrence as ``ewma_target_stream`` on the
    ``applyInPandasWithState`` API (Spark >= 3.4's GroupState): keyed
    state in the state store, no driver round-trip, any key cardinality —
    and no protobuf runtime dependency, so THIS distributed form is
    exercised by the in-container parity test
    (tests/test_streaming.py::test_ewma_gs_stream_matches_sequential)
    while the transformWithState form runs wherever pyspark's full
    streaming deps are installed.  Semantics (reference ``soft_update``,
    ``fawac.py:15-17``, A17): per micro-batch and key,
    ``target = (1 - tau) * target + tau * batch_mean`` with the batch mean
    computed over integer cents so the recurrence is float-exact vs a
    sequential replay.
    """
    import pandas as pd

    def update(key, pdf_iter, state):
        cents = 0
        n = 0
        for pdf in pdf_iter:
            cents += int(pdf["value"].map(_money_cents).sum())
            n += len(pdf)
        if n == 0:
            return
        mean = (cents / 100.0) / n
        if state.exists:
            prev_target, prev_batches = state.get
            target, batches = (1 - tau) * prev_target + tau * mean, prev_batches + 1
        else:
            target, batches = mean, 1
        state.update((target, batches))
        yield pd.DataFrame(
            {"event_type": [key[0]], "target": [target], "n_batches": [batches]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sliding_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked sliding-window rollup, 1-hour window advancing every 15
    minutes (batch equiv: sliding_1h_15min_rollup). Each event expands
    into window/slide = 4 overlapping windows map-side."""
    return (
        _with_event_time(events)
        .withWatermark("ts_ltz", watermark)
        .groupBy(
            F.window("ts_ltz", "1 hour", "15 minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --- A35 as a custom stateful operator (applyInPandasWithState) ------------

CAP_TOTAL_CENTS = 1000 * 100  # mirror batch_equiv.CAP_TOTAL in integer cents

CAPPED_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
CAPPED_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_cents", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("stopped", T.BooleanType()),
    ]
)


def capped_totals_stream(events: DataFrame) -> DataFrame:
    """The reference's episode rollout (``rollout``, ``fawac.py:597-611``,
    A35) as a *custom stateful streaming operator*: per-user running
    accumulation with permanent early stop once the total reaches the cap
    (crossing event included), via ``applyInPandasWithState``.

    State per key is three scalars (integer cents — exact — plus a count
    and the stop flag), so the state store stays tiny and partitions by
    user. Arrow moves each group's micro-batch rows in one batch; rows are
    re-sorted by (ts, event_id) inside the batch because intra-batch file
    order is not guaranteed, while cross-batch order is the arrival order
    of the CDC feed (batch equiv: capped_user_totals)."""
    import pandas as pd

    def accumulate(key, pdf_iter, state):
        (user_id,) = key
        total_cents, n, stopped = state.get if state.exists else (0, 0, False)
        for pdf in pdf_iter:
            if stopped:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"]:
                if stopped:
                    break
                total_cents += _money_cents(v)
                n += 1
                if total_cents >= CAP_TOTAL_CENTS:
                    stopped = True
        state.update((total_cents, n, stopped))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        accumulate,
        outputStructType=CAPPED_OUTPUT_SCHEMA,
        stateStructType=CAPPED_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_source_stream(spark: SparkSession, rows_per_second: int = 500) -> DataFrame:
    """Built-in rate source shaped like the events feed — the local
    stand-in for a constant-throughput CDC/Kafka topic when no file feed
    exists (load tests, soak tests). Deterministic columns derived from
    the monotonically increasing ``value``."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").cast("timestamp_ntz").alias("ts"),
        F.pmod(F.col("value"), F.lit(100)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "view", "purchase")]),
            (F.pmod(F.col("value"), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value"), F.lit(500)) / 10.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )


def click_purchase_join_stream(events: DataFrame) -> DataFrame:
    """Stream-stream interval self-join: purchases matched to the same
    user's clicks in the prior 10 minutes (batch equiv:
    click_purchase_pairs).

    Both sides carry watermarks and the join condition bounds event-time
    distance, so Spark can size the join state and expire rows — the
    canonical funnel/attribution shape. State is keyed by user_id and
    bounded to the watermark + 10-minute interval window.
    """
    e = _with_event_time(events)
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts_ltz").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts_ltz").alias("c_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        F.expr(
            "c_user_id = user_id AND "
            "c_ts >= p_ts - INTERVAL 10 MINUTES AND c_ts < p_ts"
        ),
    ).select("purchase_id", "click_id", "user_id", "click_value")


def click_purchase_left_join_stream(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join (batch equiv:
    purchase_click_left_pairs): every purchase emits, matched pairs
    immediately and click-less purchases with NULL click columns once the
    watermark passes the end of their 10-minute lookback — the state
    store can then prove no match can arrive. The attribution shape where
    un-attributed conversions matter as much as attributed ones.

    Outer-join caveat baked into the API: unmatched rows whose interval
    the watermark has NOT yet closed are withheld, so a finite feed's
    tail purchases (within the 1-hour delay of the feed's max event time)
    produce no NULL row — tests compare inside the closable region.
    """
    e = _with_event_time(events)
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts_ltz").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts_ltz").alias("c_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        F.expr(
            "c_user_id = user_id AND "
            "c_ts >= p_ts - INTERVAL 10 MINUTES AND c_ts < p_ts"
        ),
        "leftOuter",
    ).select("purchase_id", "click_id", "user_id", "click_value", "p_ts")


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join + rollup (batch equiv:
    stream_static_enrich). The static side broadcasts into every
    micro-batch — a map-side join, no watermark or state store needed
    because the dimension is not a stream."""
    return (
        events.join(F.broadcast(dim), events.user_id == dim.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


# --- A35 with event-time timers (transformWithState, round 5) --------------

# the ONE session-gap constant: importing (not mirroring) keeps the
# stream==batch equivalence contract from silently diverging
from .batch_equiv import SESSION_GAP_MIN  # noqa: E402

SESSION_CLOSE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampNTZType()),
        T.StructField("session_end", T.TimestampNTZType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def session_close_stream(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Inactivity-closed sessions via ``transformWithStateInPandas`` with
    EVENT-TIME TIMERS — the reference's episode rollout with early stop
    (``fawac.py:597-611``, A35) as a push-based stateful operator: a
    session row is EMITTED the moment the watermark passes
    ``last_event + gap``, instead of being recomputed by a batch query.

    Per user, a ValueState holds (start, last, n, cents, armed timer);
    each batch folds its rows in (ts, event_id) order, emitting any
    sessions already closed by an in-batch gap, then re-arms one timer at
    ``last + gap`` (the previous timer is deleted — exactly one timer per
    key). ``handleExpiredTimer`` emits the final session and clears
    state; a stale-timer guard ignores expiries that newer events have
    superseded. State is per-user scalars in the state store (RocksDB —
    transformWithState keeps state variables in column families), so the
    operator partitions horizontally like every other keyed pipeline.

    Batch equivalence: ``session_agg_30min_gap`` — every session whose
    close (last + gap) the final watermark passes is emitted with
    identical aggregates (tests/test_streaming.py pins it).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_min * 60_000_000
    gap_ms = gap_min * 60_000

    def _emit(user_id, start_us, last_us, n, cents):
        return pd.DataFrame(
            {
                "user_id": pd.Series([user_id], dtype="int64"),
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": pd.Series([cents / 100.0], dtype="float64"),
            }
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._state = handle.getValueState(
                "sess",
                "start_us bigint, last_us bigint, n bigint, cents bigint, "
                "timer_ms bigint",
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                start_us, last_us, n, cents, timer_ms = self._state.get()
            else:
                start_us = last_us = timer_ms = None
                n = cents = 0
            frames = [pdf[["ts_ltz", "event_id", "value"]] for pdf in rows]
            pdf = pd.concat(frames).sort_values(["ts_ltz", "event_id"])
            closed = []
            for ts, v in zip(pdf["ts_ltz"], pdf["value"]):
                t_us = ts.value // 1000
                if start_us is None:
                    start_us, last_us = t_us, t_us
                elif t_us > last_us + gap_us:
                    closed.append((start_us, last_us, n, cents))
                    start_us, last_us, n, cents = t_us, t_us, 0, 0
                n += 1
                cents += _money_cents(v)
                last_us = max(last_us, t_us)
            if timer_ms is not None:
                self._h.deleteTimer(timer_ms)
            new_timer = last_us // 1000 + gap_ms
            self._h.registerTimer(new_timer)
            self._state.update((start_us, last_us, n, cents, new_timer))
            for s in closed:
                yield _emit(user_id, *s)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._state.exists():
                return
            (user_id,) = key
            start_us, last_us, n, cents, _ = self._state.get()
            # stale-timer guard: only the timer matching the CURRENT
            # session end may close it
            if expiredTimerInfo.getExpiryTimeInMs() >= last_us // 1000 + gap_ms:
                self._state.clear()
                yield _emit(user_id, start_us, last_us, n, cents)

        def close(self) -> None:
            pass

    return (
        _with_event_time(events)
        .withWatermark("ts_ltz", "0 seconds")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=SESSION_CLOSE_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


# --- typed composite state: ListState + MapState (round 5) -----------------

PROFILE_TOP_K = 3

PROFILE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("upd_seq", T.LongType()),
        T.StructField("top_purchases", T.ArrayType(T.DoubleType())),
        T.StructField("n_types", T.IntegerType()),
        T.StructField("n_total", T.LongType()),
    ]
)


def stateful_user_profile_stream(events: DataFrame) -> DataFrame:
    """Running per-user profile on ``transformWithStateInPandas`` with
    TYPED COMPOSITE STATE — the state-variable surface beyond a single
    value: a ListState holds the running top-{PROFILE_TOP_K} purchase
    values, a MapState counts events per type, and a ValueState numbers
    the emissions so consumers can identify the newest row in update
    mode. Each state variable lives in its own RocksDB column family and
    partitions by user like every keyed pipeline; the top-k list is
    bounded, the map is bounded by the event-type domain, so state size
    is O(1) per user regardless of stream length.

    Batch equivalence: the final emission per user equals the one-shot
    batch profile (top-k purchase values, distinct type count, total
    events) — pinned in tests/test_streaming.py."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("top_vals", "value double")
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n bigint"
            )
            self._seq = handle.getValueState("seq", "upd_seq bigint")

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            top = [r[0] for r in self._top.get()] if self._top.exists() else []
            for pdf in rows:
                for et, v in zip(pdf["event_type"], pdf["value"]):
                    cur = (
                        self._counts.getValue((et,))[0]
                        if self._counts.containsKey((et,))
                        else 0
                    )
                    self._counts.updateValue((et,), (cur + 1,))
                    if et == "purchase":
                        top.append(float(v))
            top = sorted(top, reverse=True)[:PROFILE_TOP_K]
            self._top.put([(v,) for v in top])
            n_types, n_total = 0, 0
            for _, (n,) in self._counts.iterator():
                n_types += 1
                n_total += n
            seq = (self._seq.get()[0] if self._seq.exists() else 0) + 1
            self._seq.update((seq,))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([user_id], dtype="int64"),
                    "upd_seq": pd.Series([seq], dtype="int64"),
                    "top_purchases": [top],
                    "n_types": pd.Series([n_types], dtype="int32"),
                    "n_total": pd.Series([n_total], dtype="int64"),
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


# --- near-dedup on ingest (streaming LSH admission) ------------------------

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

LSH_DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("key", T.StringType()),
        T.StructField("key_ok", T.BooleanType()),
    ]
)
LSH_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("first_doc", T.LongType())])


def read_document_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-stream source over a directory of document parquet chunks —
    the local stand-in for a crawl feed arriving incrementally."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def lsh_dedup_stream(docs: DataFrame) -> DataFrame:
    """Near-dedup ON INGEST: MinHash-LSH admission as a custom stateful
    streaming operator — each arriving document is checked against every
    document ever seen WITHOUT storing any document, only the LSH band
    state (one long per live band key).

    The band table is a pure per-row map (`dedup.band_table_for` over
    `minhash_signatures_for` — the same expressions as the batch path,
    so stream and batch admissions agree exactly), so it runs inside the
    micro-batch with no pre-shuffle; the only shuffle is the state-store
    partitioning on the band key, which is uniform md5-derived.  State
    per key is the smallest doc_id seen; a document's key verdict is
    "smaller than everything previously seen on this key", and its
    admission (computed downstream, e.g. in the sink) is the AND over
    its band keys.

    ORDERING CONTRACT: emitted verdicts are never retracted, so the
    AND-over-keys admission is exact ONLY under id-ordered (monotone)
    ingest, where it equals the batch closed form
    (`batch_equiv.lsh_dedup_admissions`) — the property the stream==batch
    suite pins.  Under out-of-order arrival the operator stays
    well-defined (state converges to the per-key minimum) but admission
    becomes first-arrival-wins: a later, smaller-id near-duplicate also
    gets key_ok=True at emit time because the earlier verdict cannot be
    recalled, so BOTH members of a colliding pair can be admitted
    (documented by `test_lsh_dedup_stream_out_of_order_admits_both`).
    Production feeds where doc_ids are assigned at ingest (monotone
    sequence / timestamp ids) satisfy the contract by construction; for
    genuinely unordered replays, either sort the replay by doc_id or
    treat the emitted verdicts as candidate admissions and reconcile
    against the final state table (one anti-join) at the end of the run
    — the state itself is always correct.

    100 TB shape: state size is O(distinct band keys), ~4 longs per
    corpus doc, partitioned by the state store across executors — the
    corpus itself is never rescanned, which is the same property the
    batch `incremental_lsh_dedup` models with its persisted band table.
    """
    import pandas as pd

    from ..functions.dedup import band_table_for, minhash_signatures_for

    bands = band_table_for(minhash_signatures_for(docs))

    def admit(key, pdf_iter, state):
        band, band_key = key
        first = state.get[0] if state.exists else None
        # Drain ALL Arrow chunks before sorting: a group larger than
        # arrow.maxRecordsPerBatch arrives as several chunks, and sorting
        # per-chunk would let a later-chunk smaller id slip past an
        # earlier-chunk larger one — breaking the documented convergence
        # to the batch closed form.
        all_ids = sorted(
            int(x) for pdf in pdf_iter for x in pdf["doc_id"]
        )
        out_docs: list[int] = []
        out_ok: list[bool] = []
        for d in all_ids:
            ok = first is None or d < first
            if ok:
                first = d
            out_docs.append(d)
            out_ok.append(ok)
        state.update((first,))
        yield pd.DataFrame(
            {
                "doc_id": out_docs,
                "band": [band] * len(out_docs),
                "key": [band_key] * len(out_docs),
                "key_ok": out_ok,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return bands.groupBy("band", "key").applyInPandasWithState(
        admit,
        outputStructType=LSH_DEDUP_OUTPUT_SCHEMA,
        stateStructType=LSH_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- quality-aware near-dedup on ingest (round 11) --------------------------

QUALITY_LSH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("key", T.StringType()),
        T.StructField("q", T.DoubleType()),
        T.StructField("key_ok", T.BooleanType()),
    ]
)
QUALITY_LSH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("best_doc", T.LongType()),
        T.StructField("best_q", T.DoubleType()),
    ]
)


def quality_lsh_dedup_stream(docs: DataFrame) -> DataFrame:
    """Quality-aware near-dedup ON INGEST (the VERDICT r10 upgrade of
    :func:`lsh_dedup_stream`): per LSH band key the state retains the
    BEST document seen — highest uniq-token-ratio quality score
    (rounded 6 BEFORE comparison, repo convention), doc_id ascending as
    tiebreak — so an incoming near-duplicate REPLACES the retained doc
    when its quality is strictly higher, instead of first/smallest-id
    winning forever.  A document's key verdict is "became the survivor
    on this key at arrival"; its admission is the AND over its band
    keys, exactly the ``batch_equiv.quality_dedup_admissions`` closed
    form under id-ordered ingest (pinned stream==batch).

    Same ordering contract and state-size story as ``lsh_dedup_stream``:
    verdicts are never retracted (out-of-order replays converge in
    state but emit first-arrival verdicts), and state is two scalars
    per live band key, partitioned by the uniform md5-derived key."""
    import pandas as pd

    from ..functions.dedup import band_table_for, minhash_signatures_for
    from ..functions.text import uniq_ratio_col

    # q is computed inline and THREADED through the signature/band maps
    # (a stream cannot re-join its own derivation in update mode).
    qdocs = docs.withColumn("q", F.round(uniq_ratio_col(), 6))
    bands = band_table_for(
        minhash_signatures_for(qdocs, carry=("q",)), carry=("q",)
    )

    def admit(key, pdf_iter, state):
        band, band_key = key
        best_doc, best_q = (state.get[0], state.get[1]) if state.exists else (
            None,
            None,
        )
        # Drain all Arrow chunks, then process in doc_id order (same
        # chunking rationale as lsh_dedup_stream).
        rows = sorted(
            ((int(r.doc_id), float(r.q)) for pdf in pdf_iter for r in pdf.itertuples()),
        )
        out: list[tuple[int, float, bool]] = []
        for d, qv in rows:
            better = (
                best_doc is None
                or qv > best_q
                or (qv == best_q and d < best_doc)
            )
            if better:
                best_doc, best_q = d, qv
            out.append((d, qv, better))
        state.update((best_doc, best_q))
        yield pd.DataFrame(
            {
                "doc_id": [d for d, _, _ in out],
                "band": [band] * len(out),
                "key": [band_key] * len(out),
                "q": [qv for _, qv, _ in out],
                "key_ok": [ok for _, _, ok in out],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return bands.groupBy("band", "key").applyInPandasWithState(
        admit,
        outputStructType=QUALITY_LSH_OUTPUT_SCHEMA,
        stateStructType=QUALITY_LSH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- watermark-buffered near-dedup on ingest (round 12) ---------------------
#
# VERDICT r11 #6: lsh_dedup_stream's exactness contract requires
# id-ordered ARRIVAL because verdicts are never retracted.  This variant
# moves the requirement from arrival order to EVENT-TIME order, which a
# watermark can actually enforce: arrivals are HELD in per-band-key state
# until the event-time watermark passes their timestamp, then admitted in
# deterministic (ingest_ts, doc_id) order.  Any feed whose doc ids are
# assigned in event-time order (the production case: ingest-sequence or
# timestamp-derived ids) now matches the batch closed form under
# ARBITRARY arrival order, as long as disorder stays within the watermark
# delay; rows later than the delay are dropped by the watermark operator
# upstream (the documented boundary, pinned by the late-arrival test).

DOC_TS_STREAM_SCHEMA = T.StructType(
    list(DOC_STREAM_SCHEMA) + [T.StructField("ingest_ts", T.TimestampType())]
)

# first_doc uses -1 as the "no survivor yet" sentinel (state tuples
# round-trip more robustly without nullable scalars); pend_* are the
# parallel arrays of buffered not-yet-mature arrivals.
WM_LSH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_doc", T.LongType()),
        T.StructField("pend_ids", T.ArrayType(T.LongType())),
        T.StructField("pend_us", T.ArrayType(T.LongType())),
    ]
)


def read_document_stream_ts(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-stream source over document chunks that carry an
    ``ingest_ts`` event-time column (the watermarked feed shape)."""
    return (
        spark.readStream.schema(DOC_TS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def lsh_dedup_stream_watermarked(
    docs: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """Near-dedup ON INGEST with a WATERMARK-BUFFERED admission order
    (VERDICT r11 #6): same MinHash-LSH band-key state as
    :func:`lsh_dedup_stream`, but an arriving document's verdict is
    deferred — buffered in state — until the event-time watermark
    passes its ``ingest_ts``, at which point every matured arrival on
    the key is admitted in (ingest_ts, doc_id) order.

    ORDERING CONTRACT (relaxed): admission equals the batch closed form
    (``batch_equiv.lsh_dedup_admissions``) for ANY arrival order,
    provided (a) doc ids are assigned in event-time order — true by
    construction for ingest-sequence ids — and (b) each row's disorder
    is within the watermark ``delay`` (later rows are dropped upstream
    by the watermark operator and never admitted: the boundary the
    late-arrival test pins).  This is exactly the contract
    ``lsh_dedup_stream``'s docstring could not offer: there the verdict
    was emitted at arrival, here it is emitted at watermark maturity,
    so the out-of-order double-admit cannot happen.

    100 TB shape: state per band key is the survivor id plus ONLY the
    in-flight rows inside the watermark horizon (O(delay × key rate),
    not O(corpus)); emission shifts one watermark delay later, the
    standard completeness/latency trade.  Verdicts for a doc can land
    in different micro-batches per band key; the per-doc admission
    reduction (AND over keys) is unchanged."""
    import pandas as pd

    from ..functions.dedup import band_table_for, minhash_signatures_for

    wdocs = docs.withWatermark("ingest_ts", delay)
    bands = band_table_for(
        minhash_signatures_for(wdocs, carry=("ingest_ts",)), carry=("ingest_ts",)
    )

    def admit(key, pdf_iter, state):
        band, band_key = key
        if state.exists:
            first, pend_ids, pend_us = state.get
            pend = list(zip((int(u) for u in pend_us), (int(i) for i in pend_ids)))
        else:
            first, pend = -1, []
        wm_us = state.getCurrentWatermarkMs() * 1000
        for pdf in pdf_iter:
            for r in pdf.itertuples():
                # pandas Timestamp .value is ns since epoch.  A NEW
                # arrival already at-or-behind the watermark is late
                # beyond the delay: Spark's upstream late-row drop is
                # best-effort for arbitrary stateful ops (see the
                # append-rollup test's note), so the boundary is
                # enforced here — dropped, never admitted.  Buffered
                # rows at-or-behind the watermark are different: they
                # arrived on time and are now MATURE.
                ts_us = int(r.ingest_ts.value) // 1000
                if ts_us > wm_us:
                    pend.append((ts_us, int(r.doc_id)))
        mature = sorted(t for t in pend if t[0] <= wm_us)
        rest = [t for t in pend if t[0] > wm_us]
        out_docs: list[int] = []
        out_ok: list[bool] = []
        for _, d in mature:
            ok = first < 0 or d < first
            if ok:
                first = d
            out_docs.append(d)
            out_ok.append(ok)
        state.update((first, [d for _, d in rest], [u for u, _ in rest]))
        if rest:
            # fire again once the watermark passes the oldest buffered
            # row (+1 ms: the timeout must sit strictly beyond the
            # current watermark after the µs→ms floor)
            state.setTimeoutTimestamp(min(u for u, _ in rest) // 1000 + 1)
        if out_docs:
            yield pd.DataFrame(
                {
                    "doc_id": out_docs,
                    "band": [band] * len(out_docs),
                    "key": [band_key] * len(out_docs),
                    "key_ok": out_ok,
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return bands.groupBy("band", "key").applyInPandasWithState(
        admit,
        outputStructType=LSH_DEDUP_OUTPUT_SCHEMA,
        stateStructType=WM_LSH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- semantic dedup on ingest (streaming SemDeDup admission) ---------------

EMB_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

SEM_DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cent_id", T.LongType()),
        T.StructField("n_earlier_dups", T.LongType()),
        T.StructField("admitted", T.BooleanType()),
    ]
)
# Per-cell state: every vector seen in the cell (ids + row-major flat
# embedding matrix + hoisted norms).  Embeddings ARE the state here —
# unlike the LSH path there is no sketch that preserves cosine exactly,
# so the honest per-cell memory is O(cell vectors x dim), which is the
# point of the cell blocking: k ~ sqrt(n) keeps each cell's slab bounded
# and the state store spreads cells across executors.
SEM_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("flat", T.ArrayType(T.DoubleType())),
        T.StructField("nrms", T.ArrayType(T.DoubleType())),
    ]
)


def read_embedding_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-stream source over embedding parquet chunks — the local
    stand-in for an embedding feed arriving incrementally."""
    return (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def semantic_dedup_stream(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    rp_sub_planes: int = 0,
) -> DataFrame:
    """Semantic dedup ON INGEST — the embedding-side twin of
    ``lsh_dedup_stream``: each arriving vector is routed to its nearest
    seed centroid (pure per-batch Arrow map, no pre-shuffle) and
    admitted iff no vector previously seen in that cell lies within
    ``SEMDEDUP_COS``; the per-cell state appends every arrival
    (conservative non-recursive admission, the
    ``incremental_lsh_dedup`` convention).

    ``centroids`` is the frozen coarse quantizer — (cent_id, vector)
    pairs sorted by cent_id, k ~ sqrt(n) entries, closed over by the
    routing UDF exactly like the batch k-means cycle collects its k x d
    matrix (similarity.py); at 100 TB this is a few MB broadcast with
    the task closure, never a join.  Cosines round to 6 before both the
    argmax and the threshold (the engine-portability convention shared
    with `cosine_assigned_cells`), with ties to the lower cent_id.
    Caveat shared by every cross-engine rounding seam in this repo:
    numpy's scaled-multiply round vs the JVM's decimal HALF_UP can
    disagree within ~1 ulp of a 1e-6 boundary, so stream==batch
    equality is exact up to that measure-near-zero set (the fixture
    suite crosses no boundary; a production gate would compare with a
    1e-6 tolerance instead of equality).

    ORDERING CONTRACT: verdicts are never retracted, so admission
    equals the batch closed form
    (``batch_equiv.semantic_dedup_admissions``) only under id-ordered
    ingest.  Unlike ``lsh_dedup_stream`` (whose per-key verdict is
    "smaller than the state minimum", so a late smaller id can
    double-admit), the check here is against every previously SEEN
    vector — out-of-order arrival therefore never admits both members
    of a close pair; it admits the FIRST arrival where the batch form
    would admit the smallest id (documented by
    ``test_semantic_dedup_stream_out_of_order_keeps_first``).  State
    always converges to the full cell membership regardless of order.

    100 TB shape: routing is embarrassingly parallel; the only shuffle
    is the state-store partitioning on the cell key.  A hot cell is a
    real skew risk (unlike md5 band keys) — production either splits
    hot cells by raising k or sub-blocks a cell with a secondary RP
    bucket.  The latter is the ``rp_sub_planes`` dial: with b > 0 the
    state key becomes (cent_id, sign-pattern of the first b fixed
    hyperplanes), splitting every cell's state and comparisons 2^b
    ways; the recall cost (near-duplicates straddling a hyperplane are
    never compared) is the standard LSH trade, and the matching batch
    closed form is ``semantic_dedup_admissions_df(rp_sub_planes=b)``
    (stream==batch pinned at b=2).  The fixture keeps k small so the
    oracle can replay assignment.
    """
    import numpy as np

    from ..functions.similarity import (
        EMB_DIM,
        HYPERPLANES,
        SEMDEDUP_COS,
        validate_sub_planes,
    )

    validate_sub_planes(rp_sub_planes)
    cids = [int(c) for c, _ in centroids]
    assert cids == sorted(cids), "centroids must be sorted by cent_id"
    cmat = np.asarray([v for _, v in centroids], dtype=np.float64)
    cnrm = np.sqrt((cmat * cmat).sum(axis=1))
    cid_arr = np.asarray(cids, dtype=np.int64)
    planes = np.asarray(HYPERPLANES[:rp_sub_planes], dtype=np.float64)
    pow2 = np.asarray([1 << h for h in range(rp_sub_planes)], dtype=np.int64)

    # ONE routing UDF: the Arrow-list -> matrix decode is the expensive
    # part of the pass, so cell and sub-bucket are computed from the same
    # decoded matrix instead of two UDFs decoding twice.  The sub sign is
    # taken on the ROUND-6 hyperplane dot (mirrors _sub_bucket_expr_spark
    # / _sub_bucket_sql_duck) so the KEY agrees across the three
    # summation orders involved.
    @F.pandas_udf("struct<cent_id: long, sub: int>")
    def route(emb: pd.Series) -> pd.DataFrame:
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in emb], dtype=np.float64
        )
        nrm = np.sqrt((mat * mat).sum(axis=1))
        cos = np.round((mat @ cmat.T) / (nrm[:, None] * cnrm[None, :]), 6)
        # argmax returns the FIRST max index; centroids are sorted by
        # cent_id, so rounded ties break to the lower cent_id — same
        # total order as cosine_assigned_cells
        cent = cid_arr[np.argmax(cos, axis=1)]
        if rp_sub_planes:
            bits = np.round(mat @ planes.T, 6) > 0
            sub = (bits @ pow2).astype("int32")
        else:
            sub = np.zeros(len(cent), dtype="int32")
        return pd.DataFrame({"cent_id": cent, "sub": sub})

    routed = embs.select(
        "vec_id", "embedding", route("embedding").alias("r")
    ).select("vec_id", "embedding", "r.cent_id", "r.sub")

    # grouping keys: keep the b=0 state-key schema at ONE column so
    # checkpoints written before the sub-blocking dial existed still
    # restore (the state store validates key schema on restart)
    group_cols = ["cent_id", "sub"] if rp_sub_planes else ["cent_id"]

    def admit(key, pdf_iter, state):
        cent_id = key[0]
        # Drain all Arrow chunks before sorting (same reasoning as the
        # LSH admit fn: per-chunk processing would break id order).
        rows = sorted(
            (
                (int(i), np.asarray(v, dtype=np.float64))
                for pdf in pdf_iter
                for i, v in zip(pdf["vec_id"], pdf["embedding"])
            ),
            key=lambda t: t[0],
        )
        if state.exists:
            ids, flat, nrms = state.get
            ids = list(ids)
            prior = np.asarray(flat, dtype=np.float64).reshape(len(ids), EMB_DIM)
            prior_nrm = np.asarray(nrms, dtype=np.float64)
        else:
            ids = []
            prior = np.zeros((0, EMB_DIM))
            prior_nrm = np.zeros(0)
        # One preallocated (state + batch) slab, filled in place — a
        # per-row np.vstack would re-copy the whole matrix each arrival
        # (O(m^2 d) per micro-batch, worst exactly at the hot-cell skew
        # the docstring warns about).
        n_prior, n_new = prior.shape[0], len(rows)
        mat = np.empty((n_prior + n_new, EMB_DIM))
        mat[:n_prior] = prior
        nrm = np.empty(n_prior + n_new)
        nrm[:n_prior] = prior_nrm
        out_ids: list[int] = []
        out_n: list[int] = []
        for j, (vid, vec) in enumerate(rows):
            seen = n_prior + j
            vnrm = float(np.sqrt((vec * vec).sum()))
            if seen:
                cos = np.round((mat[:seen] @ vec) / (nrm[:seen] * vnrm), 6)
                n_dups = int((cos >= SEMDEDUP_COS).sum())
            else:
                n_dups = 0
            out_ids.append(vid)
            out_n.append(n_dups)
            ids.append(vid)
            mat[seen] = vec
            nrm[seen] = vnrm
        state.update((ids, mat.reshape(-1).tolist(), nrm.tolist()))
        yield pd.DataFrame(
            {
                "vec_id": pd.Series(out_ids, dtype="int64"),
                "cent_id": pd.Series([cent_id] * len(out_ids), dtype="int64"),
                "n_earlier_dups": pd.Series(out_n, dtype="int64"),
                "admitted": [n == 0 for n in out_n],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return routed.groupBy(*group_cols).applyInPandasWithState(
        admit,
        outputStructType=SEM_DEDUP_OUTPUT_SCHEMA,
        stateStructType=SEM_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Watermark-buffered semantic dedup (VERDICT r12 #4): the same
# buffer-until-watermark + admit-in-(ingest_ts, id)-order recipe proven
# on the LSH gate (lsh_dedup_stream_watermarked above) applied to the
# embedding side, removing semantic_dedup_stream's id-ordered-ingest
# precondition.

EMB_TS_STREAM_SCHEMA = T.StructType(
    list(EMB_STREAM_SCHEMA) + [T.StructField("ingest_ts", T.TimestampType())]
)

# Seen-set state (ids/flat/nrms, as SEM_DEDUP_STATE_SCHEMA) plus the
# parallel pending arrays of buffered not-yet-mature arrivals — the
# embedding payload must be buffered too (unlike LSH there is no sketch
# that preserves cosine), so pending cost is O(delay x cell rate x dim).
WM_SEM_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("flat", T.ArrayType(T.DoubleType())),
        T.StructField("nrms", T.ArrayType(T.DoubleType())),
        T.StructField("pend_ids", T.ArrayType(T.LongType())),
        T.StructField("pend_flat", T.ArrayType(T.DoubleType())),
        T.StructField("pend_us", T.ArrayType(T.LongType())),
    ]
)


def read_embedding_stream_ts(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-stream source over embedding chunks that carry an
    ``ingest_ts`` event-time column (the watermarked feed shape)."""
    return (
        spark.readStream.schema(EMB_TS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def semantic_dedup_stream_watermarked(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    delay: str = "10 minutes",
) -> DataFrame:
    """Semantic dedup ON INGEST with a WATERMARK-BUFFERED admission
    order (VERDICT r12 #4): same cell routing and close-pair check as
    :func:`semantic_dedup_stream`, but an arriving vector's verdict is
    deferred — buffered (with its embedding) in per-cell state — until
    the event-time watermark passes its ``ingest_ts``, then every
    matured arrival is admitted in (ingest_ts, vec_id) order.

    ORDERING CONTRACT (relaxed): admission equals the batch closed form
    (``batch_equiv.semantic_dedup_admissions``) for ANY arrival order,
    provided (a) vec ids are assigned in event-time order (true by
    construction for ingest-sequence ids) and (b) each row's disorder is
    within the watermark ``delay`` — later rows are dropped at the state
    handler (the boundary the late-arrival test pins), never admitted.
    The unbuffered twin could only promise "exactly one member of a
    close pair is admitted"; this one pins WHICH member (the smallest
    id, the batch form's survivor).

    100 TB shape: the seen-set state is the honest O(cell vectors x dim)
    slab (the cell blocking's point, as the twin documents); buffering
    adds only the in-flight rows inside the watermark horizon.  Routing
    stays a pure Arrow map; the sub-blocking dial is omitted here (the
    b > 0 key schema composes identically if needed)."""
    import numpy as np

    from ..functions.similarity import EMB_DIM, SEMDEDUP_COS

    cids = [int(c) for c, _ in centroids]
    assert cids == sorted(cids), "centroids must be sorted by cent_id"
    cmat = np.asarray([v for _, v in centroids], dtype=np.float64)
    cnrm = np.sqrt((cmat * cmat).sum(axis=1))
    cid_arr = np.asarray(cids, dtype=np.int64)

    @F.pandas_udf("long")
    def route(emb: pd.Series) -> pd.Series:
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in emb], dtype=np.float64
        )
        nrm = np.sqrt((mat * mat).sum(axis=1))
        cos = np.round((mat @ cmat.T) / (nrm[:, None] * cnrm[None, :]), 6)
        return pd.Series(cid_arr[np.argmax(cos, axis=1)])

    routed = embs.withWatermark("ingest_ts", delay).select(
        "vec_id", "embedding", "ingest_ts", route("embedding").alias("cent_id")
    )

    def admit(key, pdf_iter, state):
        cent_id = int(key[0])
        if state.exists:
            ids, flat, nrms, pend_ids, pend_flat, pend_us = state.get
            ids = list(ids)
            prior = np.asarray(flat, dtype=np.float64).reshape(len(ids), EMB_DIM)
            prior_nrm = np.asarray(nrms, dtype=np.float64)
            pmat = np.asarray(pend_flat, dtype=np.float64).reshape(
                len(pend_ids), EMB_DIM
            )
            pend = [
                (int(u), int(i), pmat[j])
                for j, (u, i) in enumerate(zip(pend_us, pend_ids))
            ]
        else:
            ids = []
            prior = np.zeros((0, EMB_DIM))
            prior_nrm = np.zeros(0)
            pend = []
        wm_us = state.getCurrentWatermarkMs() * 1000
        for pdf in pdf_iter:
            for vid, vec, ts in zip(
                pdf["vec_id"], pdf["embedding"], pdf["ingest_ts"]
            ):
                # same boundary note as lsh_dedup_stream_watermarked: a
                # NEW arrival already at-or-behind the watermark is late
                # beyond the delay — dropped here, never admitted.
                ts_us = int(ts.value) // 1000
                if ts_us > wm_us:
                    pend.append((ts_us, int(vid), np.asarray(vec, dtype=np.float64)))
        mature = sorted(
            (t for t in pend if t[0] <= wm_us), key=lambda t: (t[0], t[1])
        )
        rest = [t for t in pend if t[0] > wm_us]
        n_prior, n_new = prior.shape[0], len(mature)
        mat = np.empty((n_prior + n_new, EMB_DIM))
        mat[:n_prior] = prior
        nrm = np.empty(n_prior + n_new)
        nrm[:n_prior] = prior_nrm
        out_ids: list[int] = []
        out_n: list[int] = []
        for j, (_, vid, vec) in enumerate(mature):
            seen = n_prior + j
            vnrm = float(np.sqrt((vec * vec).sum()))
            if seen:
                cos = np.round((mat[:seen] @ vec) / (nrm[:seen] * vnrm), 6)
                n_dups = int((cos >= SEMDEDUP_COS).sum())
            else:
                n_dups = 0
            out_ids.append(vid)
            out_n.append(n_dups)
            ids.append(vid)
            mat[seen] = vec
            nrm[seen] = vnrm
        state.update(
            (
                ids,
                mat.reshape(-1).tolist(),
                nrm.tolist(),
                [i for _, i, _ in rest],
                np.concatenate([v for _, _, v in rest]).tolist() if rest else [],
                [u for u, _, _ in rest],
            )
        )
        if rest:
            state.setTimeoutTimestamp(min(u for u, _, _ in rest) // 1000 + 1)
        if out_ids:
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(out_ids, dtype="int64"),
                    "cent_id": pd.Series([cent_id] * len(out_ids), dtype="int64"),
                    "n_earlier_dups": pd.Series(out_n, dtype="int64"),
                    "admitted": [n == 0 for n in out_n],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return routed.groupBy("cent_id").applyInPandasWithState(
        admit,
        outputStructType=SEM_DEDUP_OUTPUT_SCHEMA,
        stateStructType=WM_SEM_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- token-budget gate on ingest (round 7) ----------------------------------

TOKEN_BUDGET_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("ntok", T.LongType()),
        T.StructField("admitted", T.BooleanType()),
    ]
)
# Per-source state: total tokens SEEN (admitted or not) — prefix-truncation
# semantics, one BIGINT per source.
TOKEN_BUDGET_STATE_SCHEMA = T.StructType([T.StructField("seen_tokens", T.LongType())])


def token_budget_stream(docs: DataFrame) -> DataFrame:
    """Token-budget gate ON INGEST: each arriving document is admitted
    iff its source's running token total (counting every document seen,
    admitted or not) has not yet exceeded ``TOKEN_BUDGET_PER_SOURCE`` —
    the streaming twin of the batch budget fill, with ONE BIGINT of
    state per source.

    The running total charges every arrival (prefix-truncation, the
    ``token_budget_admissions`` closed form), so the admission decision
    is a pure function of the token PREFIX and never of earlier
    admission outcomes — which is what makes the batch closed form a
    single window cumsum instead of a sequential recursion.

    ORDERING CONTRACT: admission equals the batch closed form
    (``batch_equiv.token_budget_admissions``) only when documents arrive
    in the deterministic shuffled order (ascending md5 ord_key) across
    micro-batches; within a batch the operator sorts by ord_key itself.
    That order is exactly what a curriculum replay of the
    ``shuffled_shard_manifest`` permutation produces, so the contract
    is the production feed's by construction.  Out-of-order arrival
    stays well-defined (the budget still charges every arrival once)
    but admits the earliest ARRIVALS rather than the earliest order
    positions.

    100 TB shape: the per-row map (ntok + ord_key md5) runs inside the
    micro-batch; the only shuffle is the state-store partitioning on
    source, and state is one long per source.  A power-law hot source
    concentrates its admission decisions on one state partition — but
    the per-row work there is a comparison and an add, so the gate
    keeps up with any realistic per-source arrival rate; the heavy
    lifting (tokenize/dedup downstream) is gated BEHIND the admission,
    which is the point of running the budget at ingest."""
    import pandas as pd

    from ..functions.traindata import TOKEN_BUDGET_PER_SOURCE, _shuffle_cols

    ord_key, _ = _shuffle_cols()
    keyed = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("ntok"),
        ord_key.alias("ord_key"),
    )

    def admit(key, pdf_iter, state):
        (source,) = key
        seen = int(state.get[0]) if state.exists else 0
        # Drain ALL Arrow chunks before sorting by ord_key (per-chunk
        # processing would break the ordering contract within a batch).
        rows = sorted(
            (str(k), int(d), int(n))
            for pdf in pdf_iter
            for k, d, n in zip(pdf["ord_key"], pdf["doc_id"], pdf["ntok"])
        )
        out_doc: list[int] = []
        out_ntok: list[int] = []
        out_ok: list[bool] = []
        for _, doc_id, ntok in rows:
            seen += ntok
            out_doc.append(doc_id)
            out_ntok.append(ntok)
            out_ok.append(seen <= TOKEN_BUDGET_PER_SOURCE)
        state.update((seen,))
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "source": [source] * len(out_doc),
                "ntok": out_ntok,
                "admitted": out_ok,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return keyed.groupBy("source").applyInPandasWithState(
        admit,
        outputStructType=TOKEN_BUDGET_OUTPUT_SCHEMA,
        stateStructType=TOKEN_BUDGET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Watermark-buffered token budget (VERDICT r12 #4): pending arrays on
# top of the one-BIGINT running total; matured rows charge the budget in
# (ingest_ts, ord_key) order.
WM_TOKEN_BUDGET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen_tokens", T.LongType()),
        T.StructField("pend_keys", T.ArrayType(T.StringType())),
        T.StructField("pend_ids", T.ArrayType(T.LongType())),
        T.StructField("pend_ntok", T.ArrayType(T.LongType())),
        T.StructField("pend_us", T.ArrayType(T.LongType())),
    ]
)


def token_budget_stream_watermarked(
    docs: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """Token-budget gate ON INGEST with a WATERMARK-BUFFERED admission
    order (VERDICT r12 #4): same per-source running-total state as
    :func:`token_budget_stream`, but arrivals are buffered until the
    event-time watermark passes their ``ingest_ts``, then charged to the
    budget in (ingest_ts, ord_key) order.

    ORDERING CONTRACT (relaxed): admission equals the batch closed form
    (``batch_equiv.token_budget_admissions``) for ANY arrival order,
    provided (a) event times are assigned in ord_key order — true by
    construction when the feed is a curriculum replay of the
    ``shuffled_shard_manifest`` permutation stamping ``ingest_ts`` at
    replay time — and (b) disorder stays within ``delay`` (later rows
    are dropped at the state handler, never charged or admitted: the
    documented completeness/latency trade, pinned by the late-arrival
    test).  The unbuffered twin admits the earliest ARRIVALS out of
    order; this one always admits the earliest ORDER POSITIONS.

    100 TB shape: state per source is one BIGINT plus only the in-flight
    rows inside the watermark horizon (doc ids + token counts — no text);
    the per-row work at maturity is unchanged (a compare and an add)."""
    from ..functions.traindata import TOKEN_BUDGET_PER_SOURCE, _shuffle_cols

    ord_key, _ = _shuffle_cols()
    keyed = docs.withWatermark("ingest_ts", delay).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("ntok"),
        ord_key.alias("ord_key"),
        "ingest_ts",
    )

    def admit(key, pdf_iter, state):
        (source,) = key
        if state.exists:
            seen, pend_keys, pend_ids, pend_ntok, pend_us = state.get
            seen = int(seen)
            pend = [
                (int(u), str(k), int(d), int(n))
                for u, k, d, n in zip(pend_us, pend_keys, pend_ids, pend_ntok)
            ]
        else:
            seen, pend = 0, []
        wm_us = state.getCurrentWatermarkMs() * 1000
        for pdf in pdf_iter:
            for k, d, n, ts in zip(
                pdf["ord_key"], pdf["doc_id"], pdf["ntok"], pdf["ingest_ts"]
            ):
                # late beyond the delay: dropped, never charged/admitted
                ts_us = int(ts.value) // 1000
                if ts_us > wm_us:
                    pend.append((ts_us, str(k), int(d), int(n)))
        mature = sorted(t for t in pend if t[0] <= wm_us)
        rest = [t for t in pend if t[0] > wm_us]
        out_doc: list[int] = []
        out_ntok: list[int] = []
        out_ok: list[bool] = []
        for _, _, doc_id, ntok in mature:
            seen += ntok
            out_doc.append(doc_id)
            out_ntok.append(ntok)
            out_ok.append(seen <= TOKEN_BUDGET_PER_SOURCE)
        state.update(
            (
                seen,
                [k for _, k, _, _ in rest],
                [d for _, _, d, _ in rest],
                [n for _, _, _, n in rest],
                [u for u, _, _, _ in rest],
            )
        )
        if rest:
            state.setTimeoutTimestamp(min(u for u, _, _, _ in rest) // 1000 + 1)
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "source": [source] * len(out_doc),
                    "ntok": out_ntok,
                    "admitted": out_ok,
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return keyed.groupBy("source").applyInPandasWithState(
        admit,
        outputStructType=TOKEN_BUDGET_OUTPUT_SCHEMA,
        stateStructType=WM_TOKEN_BUDGET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- span dedup on ingest (streaming exact-substring removal) ---------------

SPAN_DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("dup", T.BooleanType()),
    ]
)
SPAN_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("first_doc", T.LongType())])


def span_dedup_stream(docs: DataFrame) -> DataFrame:
    """Exact-substring span dedup ON INGEST — the streaming twin of
    ``batch_equiv.span_removal_firstseen`` (the apply half of Lee et al.
    2022 in incremental form): each arriving document's positioned
    n-grams probe a per-gram state holding the smallest doc_id ever seen,
    and a gram occurrence is flagged ``dup`` iff a strictly smaller doc
    already owns it.  The document rewrite (maximal dup runs -> marker)
    happens downstream from the emitted verdicts via
    ``functions.dedup.rewrite_excising`` — the stream never stores or
    re-emits text, only (doc_id, gram-start, verdict).

    The gram table is a pure per-row map (``positioned_grams``, the same
    expression as the batch path, so stream and batch verdicts agree
    exactly); the only shuffle is the state-store partitioning on the
    md5-derived gram hash — uniform by construction.

    ORDERING CONTRACT (same as ``lsh_dedup_stream``): verdicts are never
    retracted, so equality with the batch closed form holds under
    id-ordered (monotone) ingest — pinned in ``tests/test_streaming.py``.
    Out of order, the state still converges to the per-gram minimum but a
    late smaller-id doc keeps its spans (first-arrival-wins), mirroring
    the LSH operator's documented behavior.

    100 TB shape: state is ONE long per distinct gram ever seen — the
    suffix-array-free incarnation of the Lee et al. pipeline, spread
    across executors by the state store; daily cost is O(|batch| grams),
    never a corpus rescan.
    """
    import pandas as pd

    from ..functions.dedup import SUBSTRING_GRAM_N, positioned_grams

    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = positioned_grams(t, SUBSTRING_GRAM_N)

    def probe(key, pdf_iter, state):
        first = state.get[0] if state.exists else None
        # drain ALL Arrow chunks before sorting (same contract note as
        # lsh_dedup_stream): per-chunk sorting could let a later-chunk
        # smaller id slip past an earlier-chunk larger one
        rows = sorted(
            (int(d), int(i)) for pdf in pdf_iter for d, i in zip(pdf["doc_id"], pdf["i"])
        )
        out_d: list[int] = []
        out_i: list[int] = []
        out_dup: list[bool] = []
        for d, i in rows:
            out_d.append(d)
            out_i.append(i)
            out_dup.append(first is not None and first < d)
            first = d if first is None else min(first, d)
        state.update((first,))
        yield pd.DataFrame(
            {"doc_id": out_d, "i": out_i, "dup": out_dup}
        ).astype({"doc_id": "int64", "i": "int32", "dup": "bool"})

    from pyspark.sql.streaming.state import GroupStateTimeout

    return grams.groupBy("gram").applyInPandasWithState(
        probe,
        outputStructType=SPAN_DEDUP_OUTPUT_SCHEMA,
        stateStructType=SPAN_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Watermark-buffered span dedup (VERDICT r12 #4): -1 sentinel for "no
# owner yet" (the WM_LSH convention) plus pending (doc, start, ts)
# arrays per gram.
WM_SPAN_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_doc", T.LongType()),
        T.StructField("pend_ids", T.ArrayType(T.LongType())),
        T.StructField("pend_i", T.ArrayType(T.IntegerType())),
        T.StructField("pend_us", T.ArrayType(T.LongType())),
    ]
)


def span_dedup_stream_watermarked(
    docs: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """Exact-substring span dedup ON INGEST with a WATERMARK-BUFFERED
    admission order (VERDICT r12 #4): same per-gram smallest-owner state
    as :func:`span_dedup_stream`, but gram occurrences are buffered
    until the watermark passes their document's ``ingest_ts``, then
    judged in (ingest_ts, doc_id) order.

    ORDERING CONTRACT (relaxed): verdicts equal the batch closed form
    (``batch_equiv.span_removal_firstseen_df``) for ANY arrival order,
    provided doc ids are assigned in event-time order and disorder stays
    within ``delay`` (later rows are dropped at the state handler — the
    late-arrival boundary test).  The unbuffered twin is first-arrival-
    wins out of order; this one always keeps the smallest doc_id's
    spans, matching Lee et al.'s batch first-occurrence semantics.

    100 TB shape: state per gram is one long plus the in-flight
    occurrences inside the watermark horizon; the gram table remains the
    same pure per-row map (``positioned_grams`` with the event-time
    column carried through the explode).

    Watermark-advancement caveat: documents shorter than the gram
    length are filtered out before the explode, and the optimizer can
    evaluate that filter before the event-time stats are collected — so
    only rows that SURVIVE to the gram table advance the watermark
    (observed under Spark 4.1; the watermarked tests' flush docs carry
    >= n tokens for exactly this reason).  A production feed with any
    steady flow of gram-bearing documents advances normally."""
    from ..functions.dedup import SUBSTRING_GRAM_N, positioned_grams

    t = docs.withWatermark("ingest_ts", delay).select(
        "doc_id", F.split("text", " ").alias("toks"), "ingest_ts"
    )
    grams = positioned_grams(t, SUBSTRING_GRAM_N, carry=("ingest_ts",))

    def probe(key, pdf_iter, state):
        if state.exists:
            first, pend_ids, pend_i, pend_us = state.get
            first = int(first)
            pend = [
                (int(u), int(d), int(i))
                for u, d, i in zip(pend_us, pend_ids, pend_i)
            ]
        else:
            first, pend = -1, []
        wm_us = state.getCurrentWatermarkMs() * 1000
        for pdf in pdf_iter:
            for d, i, ts in zip(pdf["doc_id"], pdf["i"], pdf["ingest_ts"]):
                ts_us = int(ts.value) // 1000
                if ts_us > wm_us:
                    pend.append((ts_us, int(d), int(i)))
        mature = sorted(t for t in pend if t[0] <= wm_us)
        rest = [t for t in pend if t[0] > wm_us]
        out_d: list[int] = []
        out_i: list[int] = []
        out_dup: list[bool] = []
        for _, d, i in mature:
            out_d.append(d)
            out_i.append(i)
            out_dup.append(first >= 0 and first < d)
            first = d if first < 0 else min(first, d)
        state.update(
            (
                first,
                [d for _, d, _ in rest],
                [i for _, _, i in rest],
                [u for u, _, _ in rest],
            )
        )
        if rest:
            state.setTimeoutTimestamp(min(u for u, _, _ in rest) // 1000 + 1)
        if out_d:
            yield pd.DataFrame(
                {"doc_id": out_d, "i": out_i, "dup": out_dup}
            ).astype({"doc_id": "int64", "i": "int32", "dup": "bool"})

    from pyspark.sql.streaming.state import GroupStateTimeout

    return grams.groupBy("gram").applyInPandasWithState(
        probe,
        outputStructType=SPAN_DEDUP_OUTPUT_SCHEMA,
        stateStructType=WM_SPAN_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def decontam_span_stream(docs: DataFrame, eval_grams: DataFrame) -> DataFrame:
    """Decontamination ON INGEST — the streaming twin of
    ``functions.decontam.decontam_span_removal``.  Unlike the dedup
    streams this one is STATELESS: the eval gram set is a fixed artifact
    (benchmarks don't grow with the corpus), so it joins the arriving
    documents' positioned grams as a static broadcast side — a
    stream-static equi-join, no state store at all, which is exactly why
    decontamination is the cheapest hygiene gate to run on ingest.
    Emits (doc_id, i) for every contaminated gram START; the rewrite
    (coverage expand -> gaps-and-islands -> marker) happens downstream
    via ``functions.dedup.rewrite_excising``, same as the span-dedup
    stream.  Verdicts are per-document facts (no cross-doc state), so
    stream==batch holds under ANY arrival order — no ordering contract
    needed, pinned in ``tests/test_streaming.py``.
    """
    from ..functions.decontam import _GRAM_N
    from ..functions.dedup import positioned_grams

    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = positioned_grams(t, _GRAM_N)
    return grams.join(F.broadcast(eval_grams.select("gram")), "gram").select(
        "doc_id", "i"
    )


# --- Holt level+trend smoothing ON INGEST (round 10) --------------------------

HOLT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("forecast", T.DoubleType()),
    ]
)
HOLT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("rn", T.LongType()),
    ]
)


def holt_stream(events: DataFrame) -> DataFrame:
    """Holt double-exponential smoothing ON INGEST — the streaming twin
    of ``operators.windows.holt_smoothed_values``: per-user (level,
    trend, rn) live in keyed state, each arriving event advances the
    recurrence once and emits its smoothed row.  Same a=b=0.5 arithmetic
    (every multiply exact) and the same round(6)-after-1e-9-nudge as the
    batch scan, so under ts-ordered ingest stream == batch exactly
    (pinned in tests/test_streaming.py).

    State per key is two doubles and a counter — tiny, partitioned by
    user.  Events beyond the 30-event prefix are consumed (state counts
    them) but emit nothing, matching the batch prefix contract.
    """
    import pandas as pd

    from ..operators.windows import _HOLT_PREFIX, HOLT_ALPHA, HOLT_BETA

    def advance(key, pdf_iter, state):
        (user_id,) = key
        level, trend, rn = state.get if state.exists else (0.0, 0.0, 0)
        rows = sorted(
            (r.ts, int(r.event_id), float(r.value))
            for pdf in pdf_iter
            for r in pdf.itertuples()
        )
        out = {"event_id": [], "rn": [], "level": [], "trend": [], "forecast": []}
        for _, eid, x in rows:
            rn += 1
            if rn > _HOLT_PREFIX:
                continue
            if rn == 1:
                level, trend = x, 0.0
            else:
                new_level = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (level + trend)
                trend = HOLT_BETA * (new_level - level) + (1.0 - HOLT_BETA) * trend
                level = new_level
            out["event_id"].append(eid)
            out["rn"].append(rn)
            out["level"].append(round(level + 1e-9, 6))
            out["trend"].append(round(trend + 1e-9, 6))
            out["forecast"].append(round(level + trend + 1e-9, 6))
        state.update((level, trend, rn))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out["event_id"]),
                "event_id": out["event_id"],
                "rn": out["rn"],
                "level": out["level"],
                "trend": out["trend"],
                "forecast": out["forecast"],
            }
        ).astype(
            {
                "user_id": "int64",
                "event_id": "int64",
                "rn": "int32",
                "level": "float64",
                "trend": "float64",
                "forecast": "float64",
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        advance,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- snapshot retention vacuum (round 10) --------------------------------------


def vacuum_state(state_dir: str, retain_last: int = 2) -> dict[str, int]:
    """Expire old snapshot versions and reclaim unreferenced data files —
    the VACUUM / expire_snapshots maintenance half of the manifest store
    (Delta/Iceberg retention semantics on the same machinery
    ``read_upsert_state`` time-travels over).

    Keeps the newest ``retain_last`` manifests; every older manifest is
    deleted, then every data file under ``data/`` that no RETAINED
    manifest references is removed (manifests reference immutable bucket
    directories, so liveness is the union of retained manifests' bucket
    paths — a file shared with a retained epoch survives, exactly like
    Iceberg's reachability rule).  Time travel to retained versions keeps
    working; reading an expired version raises, loudly, as
    ``read_upsert_state`` already does for unknown versions.

    Returns reclamation stats.  Scale note: this is a pure manifest walk
    + file listing — O(retained manifests + files under the store), no
    Spark job; on object storage the deletes batch.
    """
    import shutil

    versions = _state_versions(state_dir)
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    expired = versions[:-retain_last] if len(versions) > retain_last else []
    retained = [v for v in versions if v not in expired]

    live_rel: set[str] = set()
    for v in retained:
        live_rel.update(_read_manifest(state_dir, v).values())
    live_abs = {os.path.normpath(os.path.join(state_dir, rel)) for rel in live_rel}

    n_files = 0
    n_bytes = 0
    data_root = os.path.join(state_dir, "data")
    if os.path.isdir(data_root):
        # walk epoch/bucket dirs bottom-up; a dir survives iff it is (or
        # contains) a live referenced path
        for root, dirs, files in os.walk(data_root, topdown=False):
            norm = os.path.normpath(root)
            if any(norm == p or norm.startswith(p + os.sep) for p in live_abs):
                continue
            if any(p.startswith(norm + os.sep) for p in live_abs):
                continue  # ancestor of a live dir — keep the shell
            for f in files:
                fp = os.path.join(root, f)
                n_bytes += os.path.getsize(fp)
                n_files += 1
                os.remove(fp)
            if not os.listdir(root):
                shutil.rmtree(root, ignore_errors=True)

    for v in expired:
        os.remove(os.path.join(state_dir, f"v{v}.json"))

    return {
        "n_versions_expired": len(expired),
        "n_versions_retained": len(retained),
        "n_files_removed": n_files,
        "bytes_reclaimed": n_bytes,
    }


# --- Holt–Winters smoothing on ingest (round 11) ----------------------------
#
# Streaming twin of operators.windows.holt_winters_hourly: the hourly
# count series arrives as a metrics feed and each (event_type)-keyed
# state advances the triple recurrence once per row.  State is the
# honest forecaster state — 2 floats, the 24-slot seasonal vector, and
# (during warmup) the first-period buffer used to seed level/season.

HW_SERIES_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
    ]
)
HW_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("hour_slot", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("seasonal", T.DoubleType()),
        T.StructField("onestep", T.DoubleType()),
    ]
)
HW_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("rn_seen", T.LongType()),
        T.StructField("buf", T.ArrayType(T.LongType())),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("season", T.ArrayType(T.DoubleType())),
    ]
)


def holt_winters_stream(series: DataFrame) -> DataFrame:
    """Additive Holt–Winters ON INGEST over a streaming hourly-count
    series — identical α=β=γ={0.5} arithmetic, first-period seeding, and
    round(6)-after-nudge as the batch scan, so under rn-ordered ingest
    stream == batch exactly (pinned in tests/test_streaming.py).

    Rows with rn inside the first period are absorbed into the seed
    buffer and emit nothing (the batch contract); every later row emits
    its smoothed (level, trend, seasonal, one-step-forecast) tuple.
    State per event type: the warmup buffer (≤24 longs, dropped after
    seeding), two floats, and the 24-slot seasonal vector."""
    import pandas as pd

    from ..operators.windows import HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD

    def advance(key, pdf_iter, state):
        (etype,) = key
        m = HW_PERIOD
        if state.exists:
            rn_seen, buf, level, trend, season = state.get
            buf = list(buf) if buf is not None else []
            season = list(season) if season is not None else []
        else:
            rn_seen, buf, level, trend, season = 0, [], 0.0, 0.0, []
        rows = sorted(
            (int(r.rn), int(r.n_events)) for pdf in pdf_iter for r in pdf.itertuples()
        )
        out = []
        for rn, x in rows:
            rn_seen += 1
            if rn_seen <= m:
                buf.append(x)
                if rn_seen == m:
                    level = float(sum(buf)) / m
                    trend = 0.0
                    season = [float(v) - level for v in buf]
                    buf = []
                continue
            t = rn_seen - 1  # 0-based step index, matches the batch scan
            slot = t % m
            xv = float(x)
            new_level = HW_ALPHA * (xv - season[slot]) + (1.0 - HW_ALPHA) * (
                level + trend
            )
            trend = HW_BETA * (new_level - level) + (1.0 - HW_BETA) * trend
            season[slot] = (
                HW_GAMMA * (xv - new_level) + (1.0 - HW_GAMMA) * season[slot]
            )
            level = new_level
            out.append(
                (
                    etype,
                    rn,
                    slot,
                    x,
                    round(level + 1e-9, 6),
                    round(trend + 1e-9, 6),
                    round(season[slot] + 1e-9, 6),
                    round(level + trend + season[(t + 1) % m] + 1e-9, 6),
                )
            )
        state.update((rn_seen, buf, level, trend, season))
        yield pd.DataFrame(
            out,
            columns=[
                "event_type",
                "rn",
                "hour_slot",
                "n_events",
                "level",
                "trend",
                "seasonal",
                "onestep",
            ],
        ).astype(
            {
                "event_type": "object",
                "rn": "int32",
                "hour_slot": "int32",
                "n_events": "int64",
                "level": "float64",
                "trend": "float64",
                "seasonal": "float64",
                "onestep": "float64",
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return series.groupBy("event_type").applyInPandasWithState(
        advance,
        outputStructType=HW_STREAM_OUTPUT_SCHEMA,
        stateStructType=HW_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- Page–Hinkley drift detection on ingest (round 12 extension) -------------
#
# Streaming twin of operators.stats_ext.page_hinkley_by_type: the
# day-ordered per-type daily-mean series arrives as a metrics feed
# (operators.stats_ext.ph_daily_series is the feed contract, carrying
# the PINNED reference mean — the monitoring semantics where the
# baseline was fit offline and ingest only advances the detector), and
# each (event_type)-keyed state advances run/running-min once per row.
# Identical float op order to the batch window scan, so under
# rn-ordered ingest stream == batch exactly (pinned in
# tests/test_streaming.py).  State per type: 3 numbers.

PH_SERIES_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("day", T.StringType()),
        T.StructField("m", T.DoubleType()),
        T.StructField("mu", T.DoubleType()),
    ]
)

PH_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("day", T.StringType()),
        T.StructField("ph", T.DoubleType()),
        T.StructField("alarmed", T.IntegerType()),
    ]
)

PH_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("rn_seen", T.IntegerType()),
        T.StructField("run", T.DoubleType()),
        T.StructField("runmin", T.DoubleType()),
    ]
)


def page_hinkley_stream(series: DataFrame) -> DataFrame:
    """Page–Hinkley ON INGEST — see the section comment for the feed
    contract and the stream==batch argument.  Emits every row's rounded
    PH statistic and its alarm flag (ph > λ, compared AFTER round(6),
    the batch op's bounds-before-compare rule)."""
    import pandas as pd

    from ..operators.stats_ext import PH_DELTA, PH_LAMBDA

    def advance(key, pdf_iter, state):
        (etype,) = key
        if state.exists:
            rn_seen, run, runmin = state.get
        else:
            rn_seen, run, runmin = 0, 0.0, None
        rows = sorted(
            (int(r.rn), r.day, float(r.m), float(r.mu))
            for pdf in pdf_iter
            for r in pdf.itertuples()
        )
        out = []
        for rn, day, m, mu in rows:
            rn_seen += 1
            run += m - mu - PH_DELTA
            runmin = run if runmin is None else min(runmin, run)
            # round(6) with the repo's +1e-9 half-way-tie nudge, now
            # applied symmetrically on the batch op and oracle too
            # (operators/stats_ext.py page_hinkley_by_type, ADVICE r12)
            # — Python round() is banker's, SQL ROUND is half-up.
            ph = round(run - runmin + 1e-9, 6)
            out.append((etype, rn, day, ph, int(ph > PH_LAMBDA)))
        state.update((rn_seen, run, runmin))
        yield pd.DataFrame(
            out, columns=["event_type", "rn", "day", "ph", "alarmed"]
        ).astype(
            {
                "event_type": "object",
                "rn": "int32",
                "day": "object",
                "ph": "float64",
                "alarmed": "int32",
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return series.groupBy("event_type").applyInPandasWithState(
        advance,
        outputStructType=PH_STREAM_OUTPUT_SCHEMA,
        stateStructType=PH_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- dispersion (Fano) index on ingest (round 12 extension) -------------------
#
# Streaming twin of operators.stats_ext.dispersion_index_hourly: the
# zero-filled hourly count series (operators.windows.hourly_count_spine
# is the feed contract) advances exact INTEGER moments (n, Σx, Σx²) per
# event type — so the state is 3 numbers, every emission's moments are
# exactly the batch scan's over the rows seen so far, and at
# end-of-feed stream == batch with NO float caveat at all (the
# statistic derives from the integer moments).

DISP_SERIES_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("rn", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
    ]
)

DISP_STREAM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_hours", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sxx", T.LongType()),
    ]
)

DISP_STREAM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sxx", T.LongType()),
    ]
)


def dispersion_stream(series: DataFrame) -> DataFrame:
    """Exact running count moments ON INGEST — see the section comment.
    Emits the per-type (n, Σx, Σx²) after every micro-batch; the Fano
    index is a pure function of the final emission (the batch op's
    formula), so the stream==batch pin compares integers."""
    import pandas as pd

    def advance(key, pdf_iter, state):
        (etype,) = key
        n, sx, sxx = state.get if state.exists else (0, 0, 0)
        for pdf in pdf_iter:
            for x in pdf["n_events"]:
                xi = int(x)
                n += 1
                sx += xi
                sxx += xi * xi
        state.update((n, sx, sxx))
        yield pd.DataFrame(
            [(etype, n, sx, sxx)], columns=["event_type", "n_hours", "sx", "sxx"]
        ).astype(
            {"event_type": "object", "n_hours": "int64", "sx": "int64", "sxx": "int64"}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return series.groupBy("event_type").applyInPandasWithState(
        advance,
        outputStructType=DISP_STREAM_OUTPUT_SCHEMA,
        stateStructType=DISP_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
