"""Reference-semantics showcase plans (SURVEY.md §7 M8).

The full advantage/TD dataflow of the reference's ``train_one_step``
(``fawac.py:521-551``) composed as ONE declarative batch query over the
events table (events-as-transitions: value = reward signal, 'error'
events = cost signal, user = episode):

- A18 advantage projection        adv = q − v            (fawac.py:349)
- A19 TD-target                   r + (1−done)·γ·next_v  (fawac.py:366)
- A21 negated cost advantage + floors                    (fawac.py:382-387)
- A22 conjunctive safety mask     1[vc<ε]·1[qc<ε]        (fawac.py:390-391)
- A25 threshold-indicator penalty                        (fawac.py:436-443)
- A26 net advantage               rew_adv + lag·cost_adv (fawac.py:445)
- A27 capped exp weight           min(exp(β·adv), cap)   (fawac.py:446)
- A34 episode mean/std aggregation                       (fawac.py:595)
- A35 per-episode rollout accumulation with early stop   (fawac.py:597-611)

Everything is built from window functions + exact DECIMAL window
averages, so the whole pipeline is oracle-exact except the exp() weight
(rounded 6, libm ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.helpers import money
from ..registry import register

GAMMA = 0.99  # fawac_configs.py:38
COST_EPS = 0.5  # epsilon for the safety mask (fawac.py:390 shape)
MAX_LAG = 10.0  # lagrangian cap (fawac.py:166-175 shape)
BETA = 0.02  # exp-weight temperature (fawac.py:446 shape)
W_CAP = 100.0  # weight cap (fawac.py:446)


@register(
    "reference_td_advantage_pipeline",
    oracle=f"""
WITH seq AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END AS cost,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_v,
           CASE WHEN LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1.0 ELSE 0.0 END AS done,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY user_id) AS v,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY user_id) AS vc
    FROM events
)
SELECT event_id, user_id,
       value AS q,
       v,
       value - v AS adv,
       value + (1 - done) * {GAMMA} * COALESCE(next_v, 0.0) AS td_target,
       GREATEST(-(cost - vc), -1.0) AS cost_adv,
       CASE WHEN vc < {COST_EPS} AND cost < {COST_EPS} THEN 1.0 ELSE 0.0 END AS safety_mask,
       CASE WHEN vc - {COST_EPS} > 0 THEN {MAX_LAG} ELSE 0.0 END AS lagr,
       (value - v) + CASE WHEN vc - {COST_EPS} > 0 THEN {MAX_LAG} ELSE 0.0 END
                     * GREATEST(-(cost - vc), -1.0) AS net_adv,
       ROUND(LEAST(EXP({BETA} * ((value - v)
             + CASE WHEN vc - {COST_EPS} > 0 THEN {MAX_LAG} ELSE 0.0 END
               * GREATEST(-(cost - vc), -1.0))), {W_CAP}), 6) AS weight
FROM seq
""",
    tags=("m8", "reference", "pipeline"),
)
def reference_td_advantage_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed A18-A27 advantage/TD dataflow as one Catalyst plan.

    events-as-transitions: q = value, v = per-episode exact mean (DECIMAL
    window), cost = error indicator, vc = per-episode cost rate. One
    shuffle on user_id feeds every window; all downstream math is
    per-row and oracle-exact. The exp() weight is the one libm value:
    rounded 6 on both sides — at finer grids a 1-ulp engine difference
    crosses a rounding boundary with non-trivial probability per ~1e5
    rows (observed at 12 at sf0.1).
    """
    e = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")

    cost = F.when(F.col("event_type") == "error", 1.0).otherwise(0.0)
    next_v = F.lead("value").over(wseq)
    done = F.when(next_v.isNull(), 1.0).otherwise(0.0)
    v = F.sum(money("value")).over(wall).cast("double") / F.count(F.lit(1)).over(wall)
    vc = (
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).over(wall).cast("double")
        / F.count(F.lit(1)).over(wall)
    )

    seq = e.select(
        "event_id",
        "user_id",
        F.col("value").alias("q"),
        F.col("value").alias("value"),
        cost.alias("cost"),
        next_v.alias("next_v"),
        done.alias("done"),
        v.alias("v"),
        vc.alias("vc"),
    )

    adv = F.col("value") - F.col("v")
    cost_adv = F.greatest(-(F.col("cost") - F.col("vc")), F.lit(-1.0))
    lagr = F.when(F.col("vc") - COST_EPS > 0, F.lit(MAX_LAG)).otherwise(0.0)
    net_adv = adv + lagr * cost_adv
    return seq.select(
        "event_id",
        "user_id",
        "q",
        "v",
        adv.alias("adv"),
        (F.col("value") + (F.lit(1) - F.col("done")) * F.lit(GAMMA) * F.coalesce(
            F.col("next_v"), F.lit(0.0)
        )).alias("td_target"),
        cost_adv.alias("cost_adv"),
        F.when((F.col("vc") < COST_EPS) & (F.col("cost") < COST_EPS), 1.0)
        .otherwise(0.0)
        .alias("safety_mask"),
        lagr.alias("lagr"),
        net_adv.alias("net_adv"),
        F.round(F.least(F.exp(F.lit(BETA) * net_adv), F.lit(W_CAP)), 6).alias("weight"),
    )


@register(
    "episode_rollout_stats",
    oracle="""
WITH seq AS (
    SELECT user_id, ts, event_id, value, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
)
SELECT user_id,
       COUNT(*) AS episode_len,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS episode_return,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS episode_cost,
       MIN(CASE WHEN event_type = 'error' THEN rn END) AS first_error_step
FROM seq
GROUP BY user_id
""",
    tags=("m8", "reference"),
)
def episode_rollout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-episode rollout accumulation (A35): return/cost/length plus the
    early-termination step (first error), reference ``rollout``
    ``fawac.py:597-611``."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("rn", F.row_number().over(w))
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("episode_len"),
        F.sum(money("value")).cast("double").alias("episode_return"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("episode_cost"),
        F.min(F.when(F.col("event_type") == "error", F.col("rn"))).alias("first_error_step"),
    )


@register(
    "checkpoint_selection",
    oracle="""
WITH eval AS (
    SELECT user_id AS ckpt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS mean_return,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS mean_cost
    FROM events GROUP BY user_id
)
SELECT ckpt, mean_return, mean_cost
FROM eval
WHERE mean_cost < 0.25
ORDER BY mean_return DESC, ckpt
LIMIT 1
""",
    tags=("m8", "reference"),
)
def checkpoint_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-filtered best-checkpoint selection, reference
    ``train_fawac_iql.py:152-160`` (A44): max return subject to
    cost < limit, deterministic tie-break."""
    e = load_table(spark, sf_dir, "events")
    ev = e.groupBy(F.col("user_id").alias("ckpt")).agg(
        (F.sum(money("value")).cast("double") / F.count(F.lit(1))).alias("mean_return"),
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_cost"),
    )
    return (
        ev.where(F.col("mean_cost") < 0.25)
        .orderBy(F.desc("mean_return"), F.asc("ckpt"))
        .limit(1)
    )
