"""Data-layout operators: Z-order clustering and small-file compaction.

At 100 TB, scan cost is dominated by how much data min/max statistics let
the reader SKIP. Two maintenance operators make that skipping work:

- **Z-order clustering**: interleave the bits of two query dimensions
  (here: user and event-hour) into one sort key, so any contiguous range
  of the key — i.e. any file written from a range-partitioned sort on it
  — covers a small rectangle in BOTH dimensions. Filters on either
  column then prune most files, which a single-column sort only gives
  for that one column. The z-value is pure per-row bit math (codegen,
  no shuffle); the clustered write is one ``repartitionByRange`` on it.
- **Compaction**: streaming sinks and incremental upserts leave many
  small files; scan throughput collapses when file count >> executor
  count (driver listing, per-file open cost, tiny row groups).
  ``compact_files`` rewrites a directory to size-targeted files,
  preserving a clustering column order.

The ``zorder_bucket_stats`` query is the oracle-checkable core: it
computes the interleaved key and reports per-z-bucket locality (span of
each dimension inside the bucket) — exactly the min/max stats a reader
would prune on. The locality *property* (every bucket covers a small
rectangle) is asserted by ``tests/test_layout.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# 10 bits per dimension (user_id <= 1499 at sf0.1 needs 11 at larger SF —
# the BUCKET width is what matters for locality, not exact coverage of the
# id domain; ids above 2^10 wrap, which perturbs locality marginally and
# identically in both engines).
_BITS = 10
_EPOCH = "2024-01-01"


def _z_expr_spark() -> F.Column:
    """Bit-interleave (user_id, hour-index) into a z-value. Pure row math."""
    u = F.col("user_id").cast("bigint")
    h = F.col("hour_idx")
    z = F.lit(0).cast("bigint")
    for i in range(_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(u, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(h, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _z_sql() -> str:
    terms = " + ".join(
        f"(((user_id >> {i}) & 1) << {2 * i}) + (((hour_idx >> {i}) & 1) << {2 * i + 1})"
        for i in range(_BITS)
    )
    return f"CAST({terms} AS BIGINT)"


@register(
    "zorder_bucket_stats",
    oracle=f"""
WITH keyed AS (
    SELECT user_id,
           date_diff('hour', TIMESTAMP '{_EPOCH}', ts) AS hour_idx
    FROM events
), zed AS (
    SELECT user_id, hour_idx, {_z_sql()} AS zval FROM keyed
)
SELECT zval >> 14 AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(user_id) - MIN(user_id) AS BIGINT) AS user_span,
       CAST(MAX(hour_idx) - MIN(hour_idx) AS BIGINT) AS hour_span
FROM zed
GROUP BY z_bucket
ORDER BY z_bucket
""",
    tags=("layout", "zorder", "scale"),
)
def zorder_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket locality stats: the min/max pruning a reader would get.

    The z-value is per-row bit interleaving (whole-stage codegen); the
    only exchange is the per-bucket aggregate. Each bucket's user_span ×
    hour_span is the rectangle a file written from that bucket would
    cover — small in BOTH dimensions, which is the whole point."""
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        "user_id",
        F.expr(
            f"timestampdiff(HOUR, CAST('{_EPOCH} 00:00:00' AS TIMESTAMP_NTZ), ts)"
        ).alias("hour_idx"),
    )
    zed = keyed.withColumn("zval", _z_expr_spark())
    return (
        zed.groupBy(F.shiftright("zval", 14).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("user_id") - F.min("user_id")).cast("bigint").alias("user_span"),
            (F.max("hour_idx") - F.min("hour_idx")).cast("bigint").alias("hour_span"),
        )
        .orderBy("z_bucket")
    )


def zorder_write(
    df: DataFrame, out_dir: str, n_files: int = 16
) -> None:
    """Write ``df`` clustered by the z-value of (user_id, hour of ts).

    ``repartitionByRange`` on the z-value gives each output file one
    contiguous z-range — a bounded rectangle in (user, time) — so min/max
    file statistics prune on either dimension. One range shuffle; the
    sort within files keeps row groups tight too."""
    keyed = df.withColumn(
        "hour_idx",
        F.expr(f"timestampdiff(HOUR, CAST('{_EPOCH} 00:00:00' AS TIMESTAMP_NTZ), ts)"),
    ).withColumn("zval", _z_expr_spark())
    (
        keyed.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("hour_idx", "zval")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def compact_files(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_mb: int = 128,
    order_col: str | None = None,
) -> int:
    """Rewrite a many-small-files directory into ~``target_mb`` files.

    File count is computed from the actual input bytes (not row counts),
    so the result tracks the size target as data grows. Returns the
    number of files written. With ``order_col``, a range partition on it
    preserves clustering (and thus min/max pruning) through the rewrite;
    without, a plain coalesce-style repartition avoids any shuffle order
    guarantee but still hits the size target.

    At scale this is the standard nightly maintenance pass behind
    streaming sinks and incremental upserts (`streaming/cdc.py`), whose
    per-micro-batch commits intentionally favor latency over file size.
    """
    total_bytes = 0
    for root, _dirs, files in os.walk(in_dir):
        for f in files:
            if f.endswith((".parquet", ".orc")):
                total_bytes += os.path.getsize(os.path.join(root, f))
    n_files = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_dir)
    if order_col is not None:
        out = df.repartitionByRange(n_files, order_col).sortWithinPartitions(order_col)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_dir)
    written = sum(
        1
        for root, _dirs, files in os.walk(out_dir)
        for f in files
        if f.endswith(".parquet")
    )
    return written
