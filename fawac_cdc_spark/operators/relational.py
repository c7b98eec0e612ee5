"""Projection / filter / scalar-expression operators (SURVEY.md §2 M1).

Covers the reference's row-level dataflow semantics re-expressed as
declarative Spark projections so Catalyst can push filters and prune
columns at the parquet scan:

- cast / scalar scale (reference ``fawac.py:52-53,66-67`` — A2, A3)
- derived boolean columns (``fawac.py:69`` — A4)
- clamp to range via least/greatest (``fawac.py:166-175`` — A12)
- elementwise min / max+floor (``fawac.py:209-213`` — A14, A15)
- CASE WHEN threshold-indicator penalty (``fawac.py:436-443`` — A25)
- exp-weight with cap (``fawac.py:446`` — A27)
- range predicates (pre-processing ranges, ``train_fawac_iql.py:59-75`` — A38)

Plus the M0 flagship query: revenue by nation and month over the 5-table
join (scan → broadcast dim joins → shuffle join → agg → sort → limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .helpers import money

FLAGSHIP_ORACLE = """
SELECT n_name,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2
ORDER BY revenue DESC, n_name, order_month
LIMIT 10
"""


def flagship_revenue_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship M0 query as a DataFrame plan.

    Scale notes: nation/region/customer are dimension tables — Catalyst
    broadcasts them (verified via explain; autoBroadcastJoinThreshold).
    lineitem⋈orders is the one genuine shuffle; the groupBy reuses the
    post-join distribution. Filter on l_shipdate is pushed to the parquet
    scan, and only the 4 referenced lineitem columns are read.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    revenue = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("n_name"),
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"), F.asc("order_month"))
        .limit(10)
    )


register("flagship_revenue_by_nation_month", oracle=FLAGSHIP_ORACLE, tags=("m0", "join", "agg"))(
    flagship_revenue_df
)


@register(
    "scalar_transform_lineitem",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       LEAST(GREATEST(l_quantity, 5.0), 45.0) AS qty_clamped,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       CAST(l_discount > 0.05 OR l_tax > 0.04 AS INT) AS heavy_flag,
       LEAST(l_discount, l_tax) AS min_rate,
       GREATEST(GREATEST(l_discount, l_tax), 0.02) AS max_rate_floored,
       CASE WHEN l_quantity > 40 THEN 10.0
            WHEN l_quantity > 20 THEN 5.0
            ELSE 0.0 END AS qty_penalty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
""",
    tags=("m1", "projection"),
)
def scalar_transform_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level scalar surface: cast/clamp/flags/CASE (A2-A4, A12, A14-A16, A25).

    All arithmetic is per-row with a fixed expression tree, so results are
    IEEE-identical to the oracle without rounding. Stays entirely inside
    whole-stage codegen; the shipdate filter is pushed to the scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q, d, t = F.col("l_quantity"), F.col("l_discount"), F.col("l_tax")
    return li.where(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")).select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.greatest(q, F.lit(5.0)), F.lit(45.0)).alias("qty_clamped"),
        (F.col("l_extendedprice") * (F.lit(1) - d) * (F.lit(1) + t)).alias("charge"),
        ((d > 0.05) | (t > 0.04)).cast("int").alias("heavy_flag"),
        F.least(d, t).alias("min_rate"),
        F.greatest(F.greatest(d, t), F.lit(0.02)).alias("max_rate_floored"),
        F.when(q > 40, 10.0).when(q > 20, 5.0).otherwise(0.0).alias("qty_penalty"),
    )


@register(
    "case_when_order_priority",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_urgent,
       CASE WHEN o_totalprice - 200000 > 0 THEN 1.0 ELSE 0.0 END AS lag_penalty
FROM orders
""",
    tags=("m1", "projection"),
)
def case_when_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-indicator penalty shape (reference ``fawac.py:436-443``, A25)."""
    orders = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.when(tp > 300000, "high").when(tp > 100000, "mid").otherwise("low").alias("price_band"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").alias("is_urgent"),
        F.when(tp - 200000 > 0, 1.0).otherwise(0.0).alias("lag_penalty"),
    )


@register(
    "filter_range_scan",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1995-06-01' AND TIMESTAMP '1996-06-01'
  AND l_quantity BETWEEN 10 AND 20
  AND l_returnflag = 'R'
""",
    tags=("m1", "filter"),
)
def filter_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range predicates (A22, A38 inpaint-range shape).

    All three predicates are pushdown-able to the parquet scan
    (`PushedFilters` in explain); only 4 of 11 columns are read.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between(
            F.lit("1995-06-01").cast("timestamp_ntz"), F.lit("1996-06-01").cast("timestamp_ntz")
        )
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@register(
    "exp_weight_capped",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(LEAST(EXP(2.0 * (l_discount - 0.05)), 2.5), 6) AS adv_weight
FROM lineitem
WHERE l_linestatus = 'O'
""",
    tags=("m1", "projection"),
)
def exp_weight_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped exponential advantage weight (reference ``fawac.py:446``, A27).

    ``w = min(exp(beta * adv), cap)`` — per-row transcendental. libm exp()
    may differ from the JVM's in the last ulp, so both sides round to 6
    decimals before hashing.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_linestatus") == "O").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.least(F.exp(2.0 * (F.col("l_discount") - 0.05)), F.lit(2.5)), 6).alias(
            "adv_weight"
        ),
    )


@register(
    "pivot_monthly_flag_revenue",
    oracle="""
SELECT (EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate)) AS midx,
       CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS rev_a,
       CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS rev_n,
       CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R'
            THEN CAST(l_extendedprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS rev_r
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
""",
    tags=("relational", "pivot"),
)
def pivot_monthly_flag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue PIVOTED to one column per return flag — the
    wide-format report shape (the inverse of ``unpivot_pricing_metrics``
    — together they close the melt/cast pair).

    Uses the DataFrame ``pivot`` API with the VALUE LIST PROVIDED
    (['A','N','R']): with explicit values Catalyst plans ONE pass
    (no extra distinct-values job) and the pivot compiles to the same
    conditional aggregation the oracle spells with CASE WHEN — exact
    DECIMAL sums, zero-filled, cast to double per column."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    midx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    wide = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(midx.alias("midx"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(money("l_extendedprice")))
    )
    return wide.select(
        "midx",
        F.coalesce(F.col("A"), F.lit(0)).cast("double").alias("rev_a"),
        F.coalesce(F.col("N"), F.lit(0)).cast("double").alias("rev_n"),
        F.coalesce(F.col("R"), F.lit(0)).cast("double").alias("rev_r"),
    )
