"""Join operators (SURVEY.md §2 M3).

The reference has no joins; this is the Part-B mandated join surface,
generalizing its lookup/diff semantics (config diff ``train_fawac_iql.py:
28-32`` → anti join; normalization lookup ``train_fawac_iql.py:147`` →
broadcast join):

- broadcast hash join (dimension tables)
- shuffle / sort-merge join (fact ⋈ fact)
- left-semi and left-anti (EXISTS / NOT EXISTS)
- range join (equi key + time-range predicate)
- as-of join (most recent prior event per key) via union + running MAX
  window — no O(n²) cross join, scales as one shuffle + one sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .helpers import money


@register(
    "dim_denormalize_supplier",
    oracle="""
SELECT s_suppkey, s_name, n_name AS nation, r_name AS region, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
    tags=("m3", "join", "broadcast"),
)
def dim_denormalize_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash dimension denormalization (A43 lookup shape).

    nation (25 rows) and region (5 rows) are broadcast — zero shuffles;
    the plan is scan → BroadcastHashJoin ×2.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            "s_acctbal",
        )
    )


@register(
    "orders_lineitem_by_priority",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
    tags=("m3", "join", "smj"),
)
def orders_lineitem_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join (orders⋈lineitem): Catalyst picks SMJ/shuffle-hash;
    at 100 TB both sides would be bucketed on orderkey to avoid the
    shuffle entirely (demonstrated in tests/test_bucketing.py). AQE
    handles skewed order keys.

    Eager-aggregation rewrite: lineitem pre-aggregates per orderkey
    BELOW the join (legal — every join-side column it needs is functionally
    determined by the key, and the inner FK join preserves groups), so the
    join input shrinks from one-row-per-lineitem to one-row-per-order and
    the aggregation's hash distribution is reused by the join — one
    lineitem shuffle total, no distinct-expand for the order count
    (~30% faster than join-then-aggregate at sf0.1; far more at 100 TB
    where lineitem dominates the shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("lines"), F.sum(revenue).alias("rev")
    )
    return (
        o.join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("lines").alias("n_lines"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


@register(
    "semi_join_urgent_customers",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
    tags=("m3", "join", "semi"),
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one urgent order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    tags=("m3", "join", "anti"),
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the config-diff shape of reference
    ``train_fawac_iql.py:28-32`` (A36): keep keys absent from the other side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "range_join_clicks_before_purchase",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id,
       COUNT(c.event_id) AS n_prior_clicks,
       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS clicked_value
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 10 MINUTE
 AND c.ts <  p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
""",
    tags=("m3", "join", "range"),
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within the 10 minutes before each purchase.

    The equi-key (user_id) makes this a shuffle join with a range
    residual — NOT a nested-loop cross join; per-user partitions keep the
    quadratic term bounded by per-user event counts at scale.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event_id"),
        F.col("value").alias("c_value"),
    )
    joined = p.join(
        c,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("purchase_id", "user_id").agg(
        F.count("c_event_id").alias("n_prior_clicks"),
        F.sum(money("c_value")).cast("double").alias("clicked_value"),
    )


@register(
    "asof_join_last_signup_before_purchase",
    oracle="""
WITH tagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tag,
           event_type
    FROM events
    WHERE event_type IN ('signup', 'purchase')
), scanned AS (
    SELECT user_id, ts, event_id, event_type,
           MAX(CASE WHEN tag = 0 THEN ts END) OVER (
               PARTITION BY user_id
               ORDER BY ts, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_signup_ts
    FROM tagged
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, last_signup_ts
FROM scanned
WHERE event_type = 'purchase'
""",
    tags=("m3", "join", "asof"),
)
def asof_join_last_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: most recent signup at-or-before each purchase, per user.

    Spark has no native ASOF JOIN; the scalable pattern is union + one
    ordered window scan per key (running MAX of the left stream's ts) —
    a single shuffle on user_id, no range self-join blowup. At 100 TB the
    sort is per-key within partitions; skewed users are split by AQE.
    """
    e = load_table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "signup", F.lit(0)).otherwise(F.lit(1)).alias("tag"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = tagged.withColumn(
        "last_signup_ts", F.max(F.when(F.col("tag") == 0, F.col("ts"))).over(w)
    )
    return scanned.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_signup_ts",
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    scatter_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-mitigating inner equi-join (SURVEY Part B "Joins"; the manual
    fallback when AQE's skew split can't apply, e.g. skewed
    aggregation-input or a skew AQE can't see at plan time).

    One hot key otherwise lands on one reducer; salting scatters the big
    side's rows across ``n_salts`` sub-keys (deterministically, by hashing
    ``scatter_col`` — repartition-stable) and replicates the small side
    once per salt, so the hot key spreads over ``n_salts`` tasks. Cost:
    small side shuffles n_salts copies — keep it the dimension side.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    right_rep = right.withColumn("_salt", F.explode(salts))
    left_s = left.withColumn(
        "_salt", F.pmod(F.hash(F.col(scatter_col)), F.lit(n_salts)).cast("int")
    )
    return left_s.join(right_rep, [key, "_salt"]).drop("_salt")


_LATERAL_TOPK_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {customer} c, LATERAL (
    SELECT o_orderkey, o_totalprice FROM {orders} o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


@register(
    "lateral_top2_orders_per_customer",
    oracle=_LATERAL_TOPK_SQL.format(customer="customer", orders="orders"),
    tags=("join", "lateral", "topk"),
)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's two most expensive
    orders, deterministic tie-break on order key. The language-level dual
    of the ranking-window top-k (`topk_orders_per_status`); Catalyst
    rewrites the correlated limit into the same windowed plan, so the
    two formulations share the WindowGroupLimit scale path."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(_LATERAL_TOPK_SQL.format(customer="lat_customer", orders="lat_orders"))


# --- keyless interval join via time-bin blocking (round 7) -------------------
#
# `range_join_clicks_before_purchase` is saved by its user_id equi-key; a
# GLOBAL interval join ("all clicks in the 10 minutes before each purchase,
# any user") has no equi-key at all, and the naive plan is a broadcast
# nested loop over purchases x clicks — O(n*m) at any scale.  The classic
# fix: bin timestamps into windows the size of the interval, probe each
# purchase against its own bin and the previous one (a range of length W
# spans at most 2 bins of width W), equi-join on the bin, refine with the
# exact predicate.  Work drops to O(events per 2W window) per probe.

INTERVAL_BIN_SECONDS = 600  # = the 10-minute lookback, so 2 probe bins


@register(
    "binned_interval_join_counts",
    oracle=f"""
SELECT p.event_id AS purchase_id,
       COUNT(c.event_id) AS n_recent_clicks,
       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS recent_value
FROM events p
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL {INTERVAL_BIN_SECONDS} SECOND
 AND c.ts <  p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
""",
    tags=("join", "range", "interval"),
)
def binned_interval_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval join: for every purchase, count ALL clicks (any
    user) in the preceding 10 minutes.

    The oracle states the plain theta-join semantics; the Spark plan
    computes it as the bin-blocked EQUI-join: both sides bin their
    timestamps into 10-minute buckets (floor(epoch/600)), each purchase
    probes bins {{b, b-1}} (a 10-minute lookback spans at most two
    10-minute bins), candidates come from an equi-join on the bin key,
    and the exact range predicate refines the candidates.  The planner
    would otherwise emit BroadcastNestedLoopJoin — O(purchases x
    clicks); the binned form bounds the work per purchase to the events
    of a 20-minute window and shuffles on a uniform time key
    (`tests/test_plans.py` pins no-BNLJ/no-cartesian).  The 1:2 probe
    explode is the entire overhead.  Counts stay exact: a click's bin
    equals exactly one of the two probed values, so no dedup step is
    needed; the money sum uses the exact DECIMAL path."""
    e = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    p = (
        e.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.floor(sec / INTERVAL_BIN_SECONDS).alias("pbin"),
        )
        .select(
            "purchase_id",
            "p_ts",
            F.explode(F.array(F.col("pbin"), F.col("pbin") - 1)).alias("jbin"),
        )
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        F.floor(sec / INTERVAL_BIN_SECONDS).alias("cbin"),
    )
    joined = p.join(
        c,
        (F.col("cbin") == F.col("jbin"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {INTERVAL_BIN_SECONDS} SECONDS"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("c_event_id").alias("n_recent_clicks"),
        F.sum(money("c_value")).cast("double").alias("recent_value"),
    )


@register(
    "full_outer_user_reconciliation",
    oracle="""
WITH ev AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY user_id
), od AS (
    SELECT o_custkey AS user_id, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders GROUP BY o_custkey
)
SELECT COALESCE(ev.user_id, od.user_id) AS user_id,
       COALESCE(ev.n_events, 0) AS n_events,
       COALESCE(od.n_orders, 0) AS n_orders,
       COALESCE(od.total_spend, 0.0) AS total_spend,
       CAST(ev.user_id IS NOT NULL AND od.user_id IS NULL AS BOOLEAN) AS events_only,
       CAST(ev.user_id IS NULL AND od.user_id IS NOT NULL AS BOOLEAN) AS orders_only
FROM ev FULL OUTER JOIN od ON ev.user_id = od.user_id
""",
    tags=("join", "full-outer", "reconciliation"),
)
def full_outer_user_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of the two activity ledgers: clickstream
    event counts vs order history per user, keeping users present in
    EITHER side with one-sided rows flagged — the data-quality audit
    shape (which users click but never bought? which bought with no
    tracked events?) that completes the join-type surface (inner /
    broadcast / semi / anti / range / as-of / LATERAL already covered).

    Both sides pre-aggregate BEFORE the join (map-side combinable, so
    the full-outer SMJ sees |users| rows per side, never raw events or
    orders — the only scale-honest order of operations), and the spend
    sum rides exact DECIMAL.  Full outer cannot broadcast either side
    (both sides' unmatched rows must survive), so the shuffle on user_id
    is intrinsic — pre-aggregation makes it tiny."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    ev = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    od = (
        o.groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("total_spend"),
        )
    )
    evj = ev.withColumnRenamed("user_id", "e_uid")
    odj = od.withColumnRenamed("user_id", "o_uid")
    return (
        evj.join(odj, evj["e_uid"] == odj["o_uid"], "full_outer")
        .select(
            F.coalesce("e_uid", "o_uid").alias("user_id"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            (F.col("e_uid").isNotNull() & F.col("o_uid").isNull()).alias("events_only"),
            (F.col("e_uid").isNull() & F.col("o_uid").isNotNull()).alias("orders_only"),
        )
    )
