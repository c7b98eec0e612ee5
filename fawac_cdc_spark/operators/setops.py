"""Set operators (SURVEY.md §2 M5).

- tagged multi-source union — the notebook's 5-algorithm union shape
  (``make_plots.ipynb`` cells 2-3 — A47)
- EXCEPT / INTERSECT — the config-diff key comparison shape
  (``train_fawac_iql.py:28-32`` — A36)

``unionByName`` keeps the plan a zero-shuffle concatenation of scans;
EXCEPT/INTERSECT are one hash shuffle each (Spark plans them as
left-anti / left-semi aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.helpers import money
from ..registry import register


@register(
    "tagged_union_entities",
    oracle="""
SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS acctbal,
       'customer' AS entity_kind
FROM customer
UNION ALL
SELECT s_suppkey AS entity_id, s_name AS name, s_acctbal AS acctbal,
       'supplier' AS entity_kind
FROM supplier
""",
    tags=("m5", "setop", "reference"),
)
def tagged_union_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged multi-source union (A47): per-source frames unioned by name
    with a literal source tag — the notebook's multi-algorithm load."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("entity_kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("entity_kind"),
    )
    return c.unionByName(s)


@register(
    "nations_customers_except_suppliers",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("m5", "setop", "reference"),
)
def nations_customers_except_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — config-diff semantics (A36): keys present in one
    relation and absent from the other."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == EXCEPT DISTINCT (set semantics, like the SQL oracle);
    # exceptAll would keep per-row multiplicity.
    return c.subtract(s)


@register(
    "nations_customers_intersect_suppliers",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("m5", "setop"),
)
def nations_customers_intersect_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) over nation keys."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "unpivot_pricing_metrics",
    oracle="""
WITH s AS (
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value FROM s
UNPIVOT (value FOR metric IN (sum_qty, sum_price))
""",
    tags=("reshape", "unpivot"),
)
def unpivot_pricing_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (the inverse of pivot_event_type_counts): the
    per-flag metric columns melt into (metric, value) rows via
    ``unpivot`` — a zero-shuffle projection over the aggregated frame."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(money("l_extendedprice")).cast("double").alias("sum_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )
