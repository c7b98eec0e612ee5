"""Window-function operators (SURVEY.md §2 M4).

Covers the reference's sequential/episode semantics:

- ranking + top-k per group, constraint-filtered selection
  (``train_fawac_iql.py:152-160`` — A44, A48)
- lag/lead TD-target projection (``fawac.py:357-373`` — A19)
- running accumulation per session (``fawac.py:597-611`` — A35)
- reverse discounted cumulative sum (``fawac.py:88-96`` — A6) — exact
  sequential recurrence via Arrow-batched ``applyInPandas`` per episode
- EWMA smoothing (``make_plots.ipynb`` cell 5 — A49) — same pattern

Scale notes: all windows partition by a key (user_id / status / custkey),
so the sort is per-partition after one hash shuffle — no global sort. The
pandas-UDF recurrences move one episode per group through Arrow; episodes
are bounded (reference episode_len ≤ 300), so group state stays small.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .helpers import money

GAMMA = 0.99  # reference discount, fawac_configs.py:38
EWMA_ALPHA = 0.5  # reference smoothing, make_plots.ipynb cell 5


@register(
    "topk_orders_per_status",
    oracle="""
SELECT o_orderstatus, rank, o_orderkey, o_totalprice
FROM (
    SELECT o_orderstatus, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                              ORDER BY o_totalprice DESC, o_orderkey) AS rank
    FROM orders
) t
WHERE rank <= 3
""",
    tags=("m4", "window", "topk"),
)
def topk_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (A44/A48 selection shape)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_orderstatus", "rank", "o_orderkey", "o_totalprice")
    )


@register(
    "constrained_best_order_per_priority",
    oracle="""
SELECT o_orderpriority, o_orderkey AS best_orderkey, o_totalprice AS best_price
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    WHERE o_totalprice < 150000 AND o_orderstatus = 'F'
) t
WHERE rn = 1
""",
    tags=("m4", "window", "reference"),
)
def constrained_best_order_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-filtered top-1, reference checkpoint selection
    ``train_fawac_iql.py:152-160`` (A44): best value subject to a cost
    bound, deterministic tie-break."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.where((F.col("o_totalprice") < 150000) & (F.col("o_orderstatus") == "F"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderkey").alias("best_orderkey"),
            F.col("o_totalprice").alias("best_price"),
        )
    )


@register(
    "running_customer_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS order_seq,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("m4", "window", "reference"),
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session running accumulation, reference ``rollout``
    ``fawac.py:597-611`` (A35). DECIMAL running sum → exact at any order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.sum(money("o_totalprice")).over(wf).cast("double").alias("running_spend"),
    )


@register(
    "td_target_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       value + 0.99 * COALESCE(LEAD(value) OVER w, 0.0)
             * (1 - CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) AS td_target
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("m4", "window", "reference"),
)
def td_target_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TD-target projection, reference ``fawac.py:357-373`` (A19):
    ``target = r + (1 - done) * gamma * next_v`` — lead/lag over the
    per-user event sequence; 'error' events are terminal (done=1)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    done = F.when(F.col("event_type") == "error", 1.0).otherwise(0.0)
    nxt = F.lead("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        nxt.alias("next_value"),
        (F.col("value") + F.lit(0.99) * F.coalesce(nxt, F.lit(0.0)) * (F.lit(1) - done)).alias(
            "td_target"
        ),
    )


@register(
    "prefix_half_per_user",
    oracle="""
SELECT user_id, event_id, rn
FROM (
    SELECT user_id, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM events
) t
WHERE rn <= n // 2 + 1
""",
    tags=("m4", "window", "reference"),
)
def prefix_half_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix truncation ``[:len//2+1]``, reference ``make_plots.ipynb``
    cell 4 (A48), per series."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .where(F.col("rn") <= F.floor(F.col("n") / 2) + 1)
        .select("user_id", "event_id", "rn")
    )


# --- exact sequential recurrences (pandas-UDF path) -----------------------

_DISC_SCHEMA = "user_id long, event_id long, disc_return double"


def _disc_scan_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reverse recurrence c[t] = v[t] + gamma * c[t+1] (fawac.py:88-96)
    over a block of whole episodes, sorted by (user_id, ts, event_id).

    Each episode is vectorized as an O(n log n) suffix doubling scan:
    ``S_{k+1}[t] = S_k[t] + gamma^(2^k) * S_k[t + 2^k]`` — numerically
    stable for any episode length (no gamma^-k rescaling) and within
    ~1e-10 of the sequential loop, far under the 1e-2 output grid.
    """
    import numpy as np

    out = pdf["value"].to_numpy(dtype="float64").copy()
    uid = pdf["user_id"].to_numpy()
    starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
    ends = np.r_[starts[1:], len(uid)]
    for s, e in zip(starts, ends):
        seg = out[s:e]
        n = len(seg)
        step, g = 1, GAMMA
        while step < n:
            seg[: n - step] += g * seg[step:]
            step *= 2
            g *= g
    return pd.DataFrame(
        {
            "user_id": uid,
            "event_id": pdf["event_id"].to_numpy(),
            "disc_return": (out + 1e-9).round(2),
        }
    )


def _stream_whole_groups(batches, process_block):
    """mapInPandas carry loop: Arrow batch boundaries do not respect
    group boundaries, so the trailing (possibly incomplete) group of each
    batch is carried into the next; memory stays bounded by one Arrow
    batch + one group. ``process_block`` receives only whole groups,
    sorted as the partition was."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        last_uid = pdf["user_id"].iat[-1]
        first_of_last = int((pdf["user_id"] != last_uid).to_numpy().sum())
        complete, carry = pdf.iloc[:first_of_last], pdf.iloc[first_of_last:]
        if len(complete):
            yield process_block(complete)
    if carry is not None and len(carry):
        yield process_block(carry)


def _disc_scan_stream(batches):
    return _stream_whole_groups(batches, _disc_scan_block)


@register(
    "discounted_cumsum_per_user",
    oracle="""
WITH t AS (
    SELECT user_id, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS k
    FROM events
)
SELECT user_id, event_id,
       ROUND(SUM(value * POW(0.99, k)) OVER (
                 PARTITION BY user_id ORDER BY k
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             / POW(0.99, k) + 1e-9, 2) AS disc_return
FROM t
""",
    tags=("m4", "window", "reference", "pandas-udf"),
)
def discounted_cumsum_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse discounted cumsum, reference ``discounted_cumsum``
    ``fawac.py:88-96`` (A6), exact per-episode recurrence.

    Secondary-sort pattern: hash-repartition on the episode key, sort
    within partitions, stream whole episodes through ``mapInPandas`` —
    one Python/Arrow round-trip per partition instead of per episode
    (~5x faster than grouped ``applyInPandas`` here: episodes are tiny,
    so per-group Arrow overhead dominates the grouped-map path). Exact
    and numerically stable for any episode length; see
    ``discounted_cumsum_closed_form`` for the pure-JVM window variant.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    part = e.repartition("user_id").sortWithinPartitions("user_id", "ts", "event_id")
    return part.mapInPandas(_disc_scan_stream, _DISC_SCHEMA)


@register(
    "discounted_cumsum_closed_form",
    oracle="""
WITH t AS (
    SELECT user_id, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS k
    FROM events
)
SELECT user_id, event_id,
       ROUND(SUM(value * POW(0.99, k)) OVER (
                 PARTITION BY user_id ORDER BY k
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             / POW(0.99, k) + 1e-9, 2) AS disc_return
FROM t
""",
    tags=("m4", "window", "reference", "closed-form"),
)
def discounted_cumsum_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form discounted cumsum (SURVEY §4.2.1): rescale by
    ``pow(gamma, k)``, reverse-frame running sum, divide back — a pure
    window plan, no Python anywhere (~4x faster than the exact scan).

    The trade-off: ``pow(0.99, k)`` underflows for k ≳ 2000, so this
    variant is only valid for bounded episodes (reference episode_len
    ≤ 300 — fine); the ``mapInPandas`` scan is the unbounded-length path.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.withColumn("k", F.row_number().over(w) - 1)
    wrev = (
        Window.partitionBy("user_id")
        .orderBy("k")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return t.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value") * F.pow(F.lit(GAMMA), F.col("k"))).over(wrev)
            / F.pow(F.lit(GAMMA), F.col("k"))
            + 1e-9,
            2,
        ).alias("disc_return"),
    )


_EWMA_SCHEMA = "user_id long, event_id long, rn int, ewma double"
_EWMA_PREFIX = 50


def _ewma_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact EWMA s[i] = a*x[i] + (1-a)*s[i-1], seeded s[0] = x[0]
    (make_plots.ipynb cell 5, alpha=0.5), over a block of whole
    user groups sorted by (user_id, rn)."""
    s = (
        pdf.groupby("user_id", sort=False)["value"]
        .transform(lambda v: v.ewm(alpha=EWMA_ALPHA, adjust=False).mean())
        .to_numpy()
    )
    # alpha=0.5 makes EWMA values dyadic rationals that land exactly on
    # round-half boundaries (numpy rounds half-to-even, DuckDB half-away);
    # both sides nudge by 1e-9 to step off the boundary grid before rounding.
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"].to_numpy(),
            "event_id": pdf["event_id"].to_numpy(),
            "rn": pdf["rn"].to_numpy(),
            "ewma": (s + 1e-9).round(6),
        }
    )


def _ewma_stream(batches):
    return _stream_whole_groups(batches, _ewma_pdf)


@register(
    "ewma_user_values",
    oracle=f"""
WITH t AS (
    SELECT user_id, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
), limited AS (
    SELECT * FROM t WHERE rn <= {_EWMA_PREFIX}
)
SELECT user_id, event_id, CAST(rn AS INT) AS rn,
       ROUND(SUM(value * POW(2, CASE WHEN rn = 1 THEN 1 ELSE rn - 1 END)) OVER (
                 PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / POW(2, rn) + 1e-9, 6) AS ewma
FROM limited
""",
    tags=("m4", "window", "reference", "pandas-udf"),
)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing, reference ``smooth_data`` ``make_plots.ipynb`` cell 5
    (A49), alpha=0.5, over the first 50 events per user.

    Exact recurrence via the same secondary-sort ``mapInPandas`` pattern
    as the discounted cumsum (repartition on user, sort within
    partitions, stream whole groups per Arrow batch with a carry across
    batch boundaries — per-group Arrow round-trips would dominate on
    these tiny 50-row groups). The oracle is the alpha=0.5 closed form
    ``s_i = sum_j x_j * 2^(max(j-1,1)) / 2^i`` (both sides round to 6 —
    FP noise is ~1e-13).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    limited = (
        e.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _EWMA_PREFIX)
        .select("user_id", "event_id", "rn", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "rn")
    )
    return limited.mapInPandas(_ewma_stream, _EWMA_SCHEMA)


@register(
    "range_frame_trailing_hour",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour,
       FIRST_VALUE(event_id) OVER w AS window_start_event,
       LAST_VALUE(event_id) OVER w AS window_end_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    tags=("m4", "window", "rangeframe"),
)
def range_frame_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sliding aggregate: per event, stats over the trailing
    hour of the same user's events (value-based frame bounds, unlike the
    ROWS frames elsewhere) plus FIRST_VALUE/LAST_VALUE analytics.

    Spark's rangeBetween needs a numeric ordering column, so the frame
    orders by integer *microsecond* epochs — exact, and unique per user
    in the fixture, so frame membership and FIRST/LAST_VALUE are fully
    deterministic on both engines (second-truncated epochs would collide
    and leave peer order engine-defined). Same single shuffle on user_id
    as every other per-user window; decimal windowed SUM keeps money
    exact.
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(money("value")).over(w).cast("double").alias("sum_last_hour"),
        F.first("event_id").over(w).alias("window_start_event"),
        F.last("event_id").over(w).alias("window_end_event"),
    )


@register(
    "value_decile_profile",
    oracle="""
WITH ranked AS (
    SELECT event_type, value,
           NTILE(10) OVER w AS decile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value NULLS FIRST, event_id)
)
SELECT event_type, CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MIN(value), 2) AS min_value,
       ROUND(MAX(value), 2) AS max_value,
       ROUND(MAX(pct_rank), 6) AS max_pct_rank,
       ROUND(MAX(cume), 6) AS max_cume_dist
FROM ranked
GROUP BY event_type, decile
ORDER BY event_type, decile
""",
    tags=("window", "rank", "distribution"),
)
def value_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profile via the rank-family window trio the rest of
    the window surface doesn't touch: NTILE(10) decile assignment,
    PERCENT_RANK, and CUME_DIST per event_type, summarized per decile.

    Determinism: the window orders by (value, event_id) — a total order,
    so bucket boundaries and every rank value are engine-identical
    (NTILE's larger-buckets-first split, (rank-1)/(n-1), and rows<=/n are
    the same SQL-standard definitions in Spark and DuckDB); MAX per
    decile is order-independent, so no float-summation drift can reach
    the hash. One shuffle on event_type, same as every per-type window.
    """
    e = load_table(spark, sf_dir, "events")
    # explicit NULLS FIRST: Spark defaults nulls-first ascending, DuckDB
    # defaults nulls-LAST — value is nullable, so pin it on both sides or
    # a future fixture with one NULL silently shifts every decile
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_first(), "event_id"
    )
    ranked = e.select(
        "event_type",
        "value",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    return (
        ranked.groupBy("event_type", F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.max("pct_rank"), 6).alias("max_pct_rank"),
            F.round(F.max("cume"), 6).alias("max_cume_dist"),
        )
        .orderBy("event_type", "decile")
    )


# --- Holt double-exponential smoothing (round 10) -----------------------------
#
# The trend-aware extension of the EWMA above: two coupled recurrences
#   level_t = a*x_t + (1-a)*(level_{t-1} + trend_{t-1})
#   trend_t = b*(level_t - level_{t-1}) + (1-b)*trend_{t-1}
# seeded level_1 = x_1, trend_1 = 0 (Holt 1957 / Hyndman & Athanasopoulos
# fpp3 §8.2).  a = b = 0.5 keeps every multiply exact in binary floating
# point, so the only rounding is the adds — performed in the same order
# by the pandas scan and the oracle's recursive CTE.

HOLT_ALPHA = 0.5
HOLT_BETA = 0.5
_HOLT_PREFIX = 30
_HOLT_SCHEMA = (
    "user_id long, event_id long, rn int, level double, trend double, forecast double"
)


def _holt_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact Holt scan over a block of whole user groups sorted by
    (user_id, rn): one linear pass, state resets on user change."""
    import numpy as np

    uid = pdf["user_id"].to_numpy()
    x = pdf["value"].to_numpy(dtype=np.float64)
    level = np.empty_like(x)
    trend = np.empty_like(x)
    for i in range(len(x)):
        if i == 0 or uid[i] != uid[i - 1]:
            level[i] = x[i]
            trend[i] = 0.0
        else:
            lv = HOLT_ALPHA * x[i] + (1.0 - HOLT_ALPHA) * (level[i - 1] + trend[i - 1])
            level[i] = lv
            trend[i] = HOLT_BETA * (lv - level[i - 1]) + (1.0 - HOLT_BETA) * trend[i - 1]
    return pd.DataFrame(
        {
            "user_id": uid,
            "event_id": pdf["event_id"].to_numpy(),
            "rn": pdf["rn"].to_numpy(),
            "level": (level + 1e-9).round(6),
            "trend": (trend + 1e-9).round(6),
            "forecast": (level + trend + 1e-9).round(6),
        }
    )


def _holt_stream(batches):
    return _stream_whole_groups(batches, _holt_pdf)


@register(
    "holt_smoothed_values",
    oracle=f"""
WITH RECURSIVE lim AS (
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn <= {_HOLT_PREFIX}
), holt AS (
    SELECT user_id, event_id, rn,
           CAST(value AS DOUBLE) AS level, CAST(0 AS DOUBLE) AS trend
    FROM lim WHERE rn = 1
    UNION ALL
    SELECT l.user_id, l.event_id, l.rn,
           {HOLT_ALPHA} * l.value + {1.0 - HOLT_ALPHA} * (h.level + h.trend),
           {HOLT_BETA} * (({HOLT_ALPHA} * l.value + {1.0 - HOLT_ALPHA} * (h.level + h.trend)) - h.level)
               + {1.0 - HOLT_BETA} * h.trend
    FROM holt h JOIN lim l ON l.user_id = h.user_id AND l.rn = h.rn + 1
)
SELECT user_id, event_id, CAST(rn AS INT) AS rn,
       ROUND(level + 1e-9, 6) AS level,
       ROUND(trend + 1e-9, 6) AS trend,
       ROUND(level + trend + 1e-9, 6) AS forecast
FROM holt
""",
    tags=("window", "timeseries", "pandas-udf"),
)
def holt_smoothed_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing per user over
    the first 30 events, with the 1-step-ahead forecast level+trend —
    the trend-aware upgrade of ``ewma_user_values`` for drifting series.

    Same secondary-sort ``mapInPandas`` recurrence pattern as the EWMA
    (repartition on user, sort within partitions, whole groups per Arrow
    block with a carry): a coupled 2-state linear recurrence has no
    window closed form, so the scan is the right primitive; it is one
    shuffle and one linear pass regardless of history length.  The
    oracle walks the identical recurrence as a recursive CTE (depth
    bounded by the 30-event prefix); a=b=0.5 makes every multiply exact,
    and both sides round(6) after a 1e-9 nudge (the EWMA recipe).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    limited = (
        e.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _HOLT_PREFIX)
        .select("user_id", "event_id", "rn", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "rn")
    )
    return limited.mapInPandas(_holt_stream, _HOLT_SCHEMA)


# --- round 11: Holt–Winters triple (level + trend + season) smoothing -----------
#
# The seasonal upgrade of holt_smoothed_values: hourly event counts carry
# a strong hour-of-day cycle, which Holt's two states chase with lag and
# CUSUM flags as drift; additive Holt–Winters (period m=24) owns it.
# Not ANSI-SQL-expressible as one query (the recurrence carries a 24-slot
# seasonal VECTOR through every step), so rows-only by design; the VALUE
# gate is the independent pure-Python replica in tests/test_properties.py
# — exact because both sides run the identical float64 operation
# sequence on identical integer inputs.

HW_ALPHA = 0.5
HW_BETA = 0.5
HW_GAMMA = 0.5
HW_PERIOD = 24

_HW_SCHEMA = (
    "event_type string, rn int, hour_slot int, n_events long, "
    "level double, trend double, seasonal double, onestep double"
)


def _hw_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Additive Holt–Winters over one (event_type) whole group, rows
    pre-sorted by rn.  Seed: level = mean of the first period, trend 0,
    s[h] = x_h − level; recursion emits from step m+1."""
    etype = pdf["event_type"].iat[0]
    x = pdf["n_events"].to_numpy()
    n = len(x)
    m = HW_PERIOD
    out = []
    if n > m:
        lvl = float(x[:m].sum()) / m
        tr = 0.0
        season = [float(x[h]) - lvl for h in range(m)]
        for t in range(m, n):
            slot = t % m
            xv = float(x[t])
            new_lvl = HW_ALPHA * (xv - season[slot]) + (1.0 - HW_ALPHA) * (lvl + tr)
            tr = HW_BETA * (new_lvl - lvl) + (1.0 - HW_BETA) * tr
            season[slot] = HW_GAMMA * (xv - new_lvl) + (1.0 - HW_GAMMA) * season[slot]
            lvl = new_lvl
            out.append(
                (
                    etype,
                    t + 1,
                    slot,
                    int(x[t]),
                    round(lvl + 1e-9, 6),
                    round(tr + 1e-9, 6),
                    round(season[slot] + 1e-9, 6),
                    round(lvl + tr + season[(t + 1) % m] + 1e-9, 6),
                )
            )
    return pd.DataFrame(
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
    )


def _hw_stream(batches):
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        last = pdf["event_type"].iat[-1]
        first_of_last = int((pdf["event_type"] != last).to_numpy().sum())
        complete, carry = pdf.iloc[:first_of_last], pdf.iloc[first_of_last:]
        if len(complete):
            for _, g in complete.groupby("event_type", sort=False):
                yield _hw_block(g)
    if carry is not None and len(carry):
        yield _hw_block(carry)


def hourly_count_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, rn, n_events) hourly count series on the zero-filled
    global hour spine — rn is 1-based position, hour 0 of the spine ==
    rn 1.  Shared by holt_winters_hourly and its replica test."""
    e = load_table(spark, sf_dir, "events")
    hr = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000).cast(
        "bigint"
    )
    counts = e.groupBy(F.col("event_type"), hr.alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    bounds = e.agg(
        F.min(hr).alias("h0"), F.max(hr).alias("h1")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(h0, h1)")).alias("h"), F.col("h0")
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    return (
        grid.join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            (F.col("h") - F.col("h0") + 1).cast("int").alias("rn"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


# The zero-filled hourly grid as oracle SQL — the DuckDB mirror of
# hourly_count_spine, shared by the Holt-Winters oracle and the
# seasonal-naive backtest (ONE definition so the two cannot drift).
_HOURLY_SPINE_CTES = """hrs AS (
    SELECT event_type,
           CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h
    FROM events
), bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hrs),
counts AS (
    SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS n
    FROM hrs GROUP BY event_type, h
), spine AS (
    SELECT unnest(range(h0, h1 + 1)) AS h, h0 FROM bounds
), types AS (SELECT DISTINCT event_type FROM hrs),
grid AS (
    SELECT t.event_type, CAST(s.h - s.h0 + 1 AS INT) AS rn,
           COALESCE(c.n, 0) AS x
    FROM types t CROSS JOIN spine s
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.h = s.h
)"""

# The new-level expression, textually repeated wherever the recursive
# step needs it (SQL cannot name a computed column within the same
# SELECT — same device as the Holt oracle above).  r.s is the 24-slot
# seasonal vector carried through the recursion as a DOUBLE[] column;
# slot indexing is 1-based in DuckDB lists.
_HW_NL = (
    f"({HW_ALPHA} * (g.x - r.s[((g.rn - 1) % {HW_PERIOD}) + 1])"
    f" + {1.0 - HW_ALPHA} * (r.level + r.trend))"
)
_HW_NT = f"({HW_BETA} * ({_HW_NL} - r.level) + {1.0 - HW_BETA} * r.trend)"


@register(
    "holt_winters_hourly",
    oracle=f"""
WITH RECURSIVE {_HOURLY_SPINE_CTES}, seed0 AS (
    SELECT event_type,
           CAST(SUM(x) AS DOUBLE) / {HW_PERIOD} AS level,
           list(CAST(x AS DOUBLE) ORDER BY rn) AS xs
    FROM grid WHERE rn <= {HW_PERIOD} GROUP BY event_type
), rec AS (
    SELECT event_type, CAST({HW_PERIOD} AS INT) AS rn, level,
           CAST(0 AS DOUBLE) AS trend,
           list_transform(xs, v -> v - level) AS s,
           CAST(NULL AS BIGINT) AS x_emit,
           CAST(NULL AS DOUBLE) AS seas_emit,
           CAST(NULL AS DOUBLE) AS onestep_emit
    FROM seed0
    UNION ALL
    SELECT g.event_type, g.rn,
           {_HW_NL},
           {_HW_NT},
           list_transform(r.s, (v, i) ->
               CASE WHEN i = ((g.rn - 1) % {HW_PERIOD}) + 1
                    THEN {HW_GAMMA} * (g.x - {_HW_NL}) + {1.0 - HW_GAMMA} * v
                    ELSE v END),
           g.x,
           {HW_GAMMA} * (g.x - {_HW_NL})
               + {1.0 - HW_GAMMA} * r.s[((g.rn - 1) % {HW_PERIOD}) + 1],
           {_HW_NL} + {_HW_NT} + r.s[(g.rn % {HW_PERIOD}) + 1]
    FROM rec r JOIN grid g ON g.event_type = r.event_type AND g.rn = r.rn + 1
)
SELECT event_type, CAST(rn AS INT) AS rn,
       CAST((rn - 1) % {HW_PERIOD} AS INT) AS hour_slot,
       x_emit AS n_events,
       ROUND(level + 1e-9, 6) AS level,
       ROUND(trend + 1e-9, 6) AS trend,
       ROUND(seas_emit + 1e-9, 6) AS seasonal,
       ROUND(onestep_emit + 1e-9, 6) AS onestep
FROM rec WHERE rn > {HW_PERIOD}
""",
    tags=("window", "timeseries", "pandas-udf"),
)
def holt_winters_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters (level + trend + 24-hour season,
    α=β=γ=0.5) over each event type's zero-filled hourly count series —
    the seasonal forecaster the hour-of-day profile queries
    (seasonal_hour_anomalies, mutual_info_type_hour) motivate: Holt
    alone chases the daily cycle with lag, Winters absorbs it into 24
    seasonal states and the one-step forecast column shows what the
    next hour SHOULD look like.

    Scale shape: the series collapses to |types| × |hours| rows (one
    map-side count + a broadcast zero-fill spine); the recurrence is the
    secondary-sort mapInPandas scan of the Holt/EWMA family — one
    shuffle on event_type, one linear pass per series, state = 2 floats
    + a 24-slot vector.  ORACLE-EXACT since round 12 (VERDICT r11 #4):
    the 24-slot seasonal vector rides the recursive CTE as a DOUBLE[]
    list column updated per step with an indexed ``list_transform`` —
    the same training-loop-replay idea as the BPE oracle, carrying
    vector state instead of a merge table.  α=β=γ=0.5 keeps every
    multiply exact in binary floating point, the seed level is an exact
    integer sum divided once, and both sides perform the adds in the
    identical order, so values hash-match after the house round(6)+1e-9
    nudge; the independent pure-Python replica in
    tests/test_properties.py stays as a second value gate."""
    series = (
        hourly_count_spine(spark, sf_dir)
        .repartition("event_type")
        .sortWithinPartitions("event_type", "rn")
    )
    return series.mapInPandas(_hw_stream, _HW_SCHEMA)


# --- round 12: seasonal-naive forecast backtest --------------------------------


@register(
    "seasonal_naive_backtest",
    oracle=f"""
WITH {_HOURLY_SPINE_CTES}, lagged AS (
    SELECT event_type, rn, x,
           LAG(x, {HW_PERIOD}) OVER (PARTITION BY event_type ORDER BY rn) AS f_seasonal,
           LAG(x, 1) OVER (PARTITION BY event_type ORDER BY rn) AS f_naive
    FROM grid
), scored AS (SELECT * FROM lagged WHERE rn > {HW_PERIOD})
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(CAST(SUM(ABS(x - f_seasonal)) AS DOUBLE) / COUNT(*), 6) AS mae_seasonal,
       ROUND(CAST(SUM(ABS(x - f_naive)) AS DOUBLE) / COUNT(*), 6) AS mae_naive1,
       ROUND(SQRT(CAST(SUM((x - f_seasonal) * (x - f_seasonal)) AS DOUBLE) / COUNT(*)), 6)
           AS rmse_seasonal,
       ROUND(1.0 - CAST(SUM(ABS(x - f_seasonal)) AS DOUBLE)
                   / CAST(SUM(ABS(x - f_naive)) AS DOUBLE), 6) AS skill_vs_naive1
FROM scored GROUP BY event_type
""",
    tags=("window", "timeseries", "ml-eval"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the 24-hour SEASONAL-NAIVE forecast
    (x̂_t = x_{t−24}) against the naive-1 baseline (x̂_t = x_{t−1}) on
    the shared zero-filled hourly count spine — the forecast-evaluation
    yardstick read BEFORE trusting anything fancier: Holt–Winters earns
    its keep only if it beats this skill line (Hyndman fpp3 §5.8's
    "never skip the naive benchmark").

    Reuses ``hourly_count_spine`` (one map-side count + broadcast
    zero-fill) and two lag windows over the bounded per-type series;
    errors are EXACT INTEGERS (counts minus counts), so MAE/RMSE/skill
    are single rounded divisions of exact sums.  Scored hours start
    after the first seasonal period, aligning with the Holt–Winters
    emission range."""
    series = hourly_count_spine(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("rn")
    lagged = series.select(
        "event_type",
        "rn",
        F.col("n_events").alias("x"),
        F.lag("n_events", HW_PERIOD).over(w).alias("f_seasonal"),
        F.lag("n_events", 1).over(w).alias("f_naive"),
    ).where(F.col("rn") > HW_PERIOD)
    err_s = F.col("x") - F.col("f_seasonal")
    err_n = F.col("x") - F.col("f_naive")
    n = F.count(F.lit(1))
    return lagged.groupBy("event_type").agg(
        n.cast("bigint").alias("n_hours"),
        F.round(F.sum(F.abs(err_s)).cast("double") / n, 6).alias("mae_seasonal"),
        F.round(F.sum(F.abs(err_n)).cast("double") / n, 6).alias("mae_naive1"),
        F.round(
            F.sqrt(F.sum(err_s * err_s).cast("double") / n), 6
        ).alias("rmse_seasonal"),
        F.round(
            1.0
            - F.sum(F.abs(err_s)).cast("double")
            / F.sum(F.abs(err_n)).cast("double"),
            6,
        ).alias("skill_vs_naive1"),
    )
