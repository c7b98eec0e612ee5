"""Source/sink connectors (SURVEY.md §2 Part B "Scans/sources" + "Sinks").

Covers the reference's non-parquet I/O surface:

- CSV scan + projection — the notebook's ``pd.read_csv`` analytics input
  (reference ``make_plots.ipynb`` cell 1, A46)
- JSON-lines scan — schema-ful semi-structured ingestion (generalizes the
  JSON-in-string ``events.props`` fixture)
- append-mode metrics sink — the trainer's append-only keyed metric store
  (reference ``train_fawac_iql.py:145-166``, ``fawac.py:551``, A45)
- ORC roundtrip — the second columnar lake format besides parquet
  (stripe-stat pushdown, splittable scans)

The registered queries are *roundtrips*: materialize fixture data through
the format, scan it back with an explicit schema, aggregate. The oracle
runs the same aggregation directly on the parquet view, so a parity pass
proves format fidelity of the writer+reader pair (doubles survive because
both Spark writers emit shortest-round-trip representations).

Scale notes: CSV/JSON scans are splittable line formats — Spark
parallelizes by byte ranges, so a 100 TB CSV ingest scans wide; the
metrics sink is append-only partitioned parquet (no compaction needed for
an append-only log; readers prune by ``tab``).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..operators.helpers import money
from ..registry import register

CSV_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

JSONL_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("step", T.IntegerType()),
        T.StructField("tab", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _io_dir(sf_dir: str, kind: str) -> str:
    """Deterministic scratch dir per (sf_dir, connector) under the system
    temp root — queries must be re-runnable, so writers use overwrite."""
    slug = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), "fawac_cdc_spark_io", slug, kind)


def write_events_csv(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """CSV writer: header on, one projection of the events table."""
    (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite")
        .option("header", True)
        .csv(out_dir)
    )


def read_events_csv(spark: SparkSession, in_dir: str) -> DataFrame:
    """CSV scan with explicit schema (reference A46: ``pd.read_csv`` +
    positional projection; here schema-by-name, never inferred)."""
    return spark.read.schema(CSV_EVENT_SCHEMA).option("header", True).csv(in_dir)


@register(
    "csv_scan_events_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id
FROM events
GROUP BY event_type
""",
    tags=("source", "csv", "roundtrip"),
)
def csv_scan_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV roundtrip: events → CSV → scan → aggregate. Parity against the
    parquet-side oracle proves the CSV writer/reader preserve longs,
    strings, and 2-decimal doubles exactly."""
    out = _io_dir(sf_dir, "events_csv")
    write_events_csv(spark, sf_dir, out)
    return (
        read_events_csv(spark, out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


@register(
    "jsonl_scan_orders_agg",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderstatus
""",
    tags=("source", "json", "roundtrip"),
)
def jsonl_scan_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines roundtrip: orders → JSONL → schema-ful scan → aggregate.
    Timestamps cross the format as ISO-8601 strings; the explicit
    ``TimestampNTZType`` schema parses them back losslessly."""
    out = _io_dir(sf_dir, "orders_jsonl")
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .write.mode("overwrite")
        .json(out)
    )
    return (
        spark.read.schema(JSONL_ORDER_SCHEMA)
        .json(out)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("o_totalprice")).cast("double").alias("total_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


def append_metrics(df: DataFrame, metrics_dir: str) -> None:
    """A45 sink: append-only write of (step, tab, name, value) rows."""
    df.select("step", "tab", "name", "value").write.mode("append").parquet(metrics_dir)


def read_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    return spark.read.schema(METRICS_SCHEMA).parquet(metrics_dir)


@register(
    "metrics_sink_roundtrip",
    oracle="""
SELECT 1 AS step, 'counts' AS tab, event_type AS name,
       CAST(COUNT(*) AS DOUBLE) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT 2 AS step, 'totals' AS tab, event_type AS name,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value
FROM events GROUP BY event_type
""",
    tags=("sink", "metrics", "roundtrip", "reference"),
)
def metrics_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only metrics sink (A45): two training "steps" flush keyed
    metric batches into one log table; the scan-back returns the union.
    Mirrors ``logger.store(...)`` / ``logger.write(step)`` — append-only,
    keyed by (step, tab, name)."""
    out = _io_dir(sf_dir, "metrics_sink")
    # re-runnable: clear previous appends before the two-step replay
    import shutil

    shutil.rmtree(out, ignore_errors=True)

    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("value")
    )
    totals = e.groupBy("event_type").agg(
        F.sum(money("value")).cast("double").alias("value")
    )
    for step, tab, df in ((1, "counts", counts), (2, "totals", totals)):
        append_metrics(
            df.select(
                F.lit(step).alias("step"),
                F.lit(tab).alias("tab"),
                F.col("event_type").alias("name"),
                "value",
            ),
            out,
        )
    return read_metrics(spark, out)


@register(
    "partitioned_sink_pruned_scan",
    oracle="""
SELECT user_id,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
""",
    tags=("sink", "source", "partitioned", "roundtrip"),
)
def partitioned_sink_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned scan back:
    events written ``partitionBy(event_type)``, then one partition read
    with the predicate pruning at the directory level (PartitionFilters —
    asserted in tests/test_plans.py). At 100 TB partitioning on the
    dominant filter column turns full scans into single-partition reads."""
    out = _io_dir(sf_dir, "events_parted")
    (
        load_table(spark, sf_dir, "events")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "orc_roundtrip_agg",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_totalprice > 1000
GROUP BY o_orderstatus
""",
    tags=("source", "sink", "orc", "roundtrip"),
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC roundtrip: orders written as ORC, scanned back with the filter
    pushed into the ORC reader (min/max stripe stats prune like parquet
    row groups), then aggregated. Exercises the second columnar format a
    100 TB lakehouse ingests besides parquet; the oracle aggregates the
    parquet view directly, so parity proves writer+reader fidelity
    (timestamps/doubles survive the format conversion)."""
    out = _io_dir(sf_dir, "orders_orc")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
    return (
        spark.read.orc(out)
        .where(F.col("o_totalprice") > 1000)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("o_totalprice")).cast("double").alias("total_price"),
        )
    )


@register(
    "schema_evolution_scan",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM (
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS o_orderstatus
    FROM orders
)
GROUP BY o_orderstatus
""",
    tags=("source", "schema-evolution", "roundtrip"),
)
def schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations: generation 1 (even keys)
    was written before ``o_orderstatus`` existed; generation 2 (odd keys)
    carries it. ``mergeSchema`` reconciles the generations into one union
    schema with NULLs for the missing column — the additive-column
    migration every long-lived lake table goes through. The oracle
    reproduces the generation split relationally."""
    out = _io_dir(sf_dir, "orders_evolving")
    o = load_table(spark, sf_dir, "orders")
    (
        o.where(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "gen=1"))
    )
    (
        o.where(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "gen=2"))
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=1"), os.path.join(out, "gen=2")
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(money("o_totalprice")).cast("double").alias("total_price"),
    )


# Spark 4 native XML (spark-xml merged upstream in 4.0) — round 9.
XML_CUST_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


@register(
    "xml_scan_customer_agg",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
       MIN(c_custkey) AS min_custkey,
       MAX(c_custkey) AS max_custkey
FROM customer
GROUP BY c_mktsegment
""",
    tags=("source", "xml", "roundtrip"),
)
def xml_scan_customer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML roundtrip through Spark 4's NATIVE xml source (spark-xml was
    merged upstream in 4.0 — no external package): customer → XML
    (rowTag=customer) → schema-ful scan → aggregate.  Parity against the
    parquet-side oracle proves longs, strings, and 2-decimal doubles
    survive the format; the explicit schema skips inference (one less
    full read, and type drift is impossible).  At 100 TB XML is an
    INGEST format, never a working one — this query is the ingest edge:
    scan, cast, aggregate once, land in parquet."""
    out = _io_dir(sf_dir, "customer_xml")
    (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite")
        .option("rowTag", "customer")
        .format("xml")
        .save(out)
    )
    return (
        spark.read.schema(XML_CUST_SCHEMA)
        .option("rowTag", "customer")
        .format("xml")
        .load(out)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("c_acctbal")).cast("double").alias("total_acctbal"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
    )
