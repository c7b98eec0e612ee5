"""Sampling operators (SURVEY.md §2 — A5, A38).

The reference samples uniform random batches with replacement
(``fawac.py:77-85``) and density-stratified subsamples
(``train_fawac_iql.py:59-75``). Random sampling is not
oracle-reproducible across engines, so the surface splits into:

- **deterministic hash sampling** (oracle-exact): md5-prefix bucket
  filter — the scalable, repeatable "sample the same rows every run"
  primitive used by data pipelines for stable holdouts. Pure scan +
  filter, no shuffle, fully pushdown-compatible except the md5 itself.
- **seeded random sampling** (rows-only check): Spark-side
  ``orderBy(rand(seed)).limit(n)`` exact-size batches (the A5 semantic)
  and Bernoulli ``df.sample`` / stratified ``sampleBy`` (the A38
  semantic). Deterministic for a fixed seed+plan within Spark, but not
  across engines — the driver records the weaker rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .helpers import md5_bucket, md5_bucket_sql

SEED = 42  # reference seed_all / TESTDATA seed

# A-ES weighted reservoir: sample size and coin resolution.  The coin
# modulus divides 16^4 exactly (the weighted_source_mixture dyadic-coin
# rule), so u is exactly uniform over {0.5/65536, 1.5/65536, ...} and
# bit-identical across engines before the one ln() transform.
RESERVOIR_K = 64
_RES_COIN = 65536


@register(
    "hash_sample_lineitem",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 1)
      IN ('0', '1')
""",
    tags=("sampling",),
)
def hash_sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% hash sample keyed on (orderkey, linenumber).

    md5-first-hex-digit bucketing: stable across runs, engines, and
    cluster sizes — the reproducible-sample primitive for 100 TB ETL
    (no shuffle, embarrassingly parallel).
    """
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    return li.where(F.substring(F.md5(key), 1, 1).isin("0", "1")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register("seeded_batch_sample_1024", tags=("sampling", "rows-only"))
def seeded_batch_sample_1024(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size seeded uniform batch, reference ``sample``
    ``fawac.py:77-85`` (A5): 1024 rows via orderBy(rand(seed)).limit.

    Exact-size sampling costs a full shuffle sort at scale; for 100 TB
    use ``df.sample(fraction)`` (Bernoulli, no shuffle) when a ±1%
    batch-size tolerance is acceptable — both semantics exposed here.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy(F.rand(SEED))
        .limit(1024)
    )


@register("stratified_sample_events", tags=("sampling", "rows-only"))
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-event-type) Bernoulli sample, the A38
    density-stratified subsampling shape: ``sampleBy`` with per-stratum
    fractions — map-side only, no shuffle."""
    e = load_table(spark, sf_dir, "events")
    fractions = {"click": 0.5, "view": 0.1, "purchase": 1.0, "signup": 1.0, "error": 0.25}
    return e.sampleBy("event_type", fractions, seed=SEED).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "weighted_reservoir_sample",
    oracle=f"""
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
       ROUND(LN(({md5_bucket_sql('doc_id', _RES_COIN)} + 0.5) / {_RES_COIN}.0), 12)
             / n_chars AS aes_key
FROM documents
ORDER BY aes_key DESC, doc_id
LIMIT {RESERVOIR_K}
""",
    tags=("sampling", "traindata", "llm"),
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    A-ES reservoir (2006): each doc draws a uniform u and keeps key
    u^(1/w) — here the equivalent log-domain ln(u)/w — and the global
    top-K keys ARE a w-proportional sample without replacement.  The
    training-data use: pick a fixed-size document subset where longer
    docs (weight = n_chars) are proportionally likelier, reproducibly.

    The A-ES key is what makes the operator DISTRIBUTED: top-K by key
    is a map-side partial ``TakeOrderedAndProject`` (each partition
    forwards at most K rows, no shuffle stage at all — plan-pinned), and
    the same property makes it mergeable across streams or shards.  The
    uniform is the repo's exactly-uniform dyadic md5 coin, shifted by
    +0.5 so u is never 0 (ln(0) = -inf).  Cross-engine determinism:
    the md5 coin is bit-identical, so only ln()'s ~1-ulp variance needs
    absorbing — round ln(u) (range ~[-11.1, 0)) to 12dp BEFORE dividing
    by the weight, then divide at full double precision (IEEE division
    of identical doubles is identical).  Rounding the final key instead
    would collapse the top-K to a handful of rounded values — top keys
    concentrate near 0, so selection would silently fall to the doc_id
    tiebreak, destroying the w-proportional guarantee (ADVICE r7).
    12dp, not 6dp (ADVICE r8): top candidates have |ln u| as small as
    ~7.6e-6, so 6dp quantization distorted those keys by up to ~5%,
    slightly biasing the w-proportional selection among top docs; 12dp
    still absorbs ulp-level (~1e-15 relative) engine variance by six
    orders of magnitude while keeping the top-key ordering exact.
    """
    d = load_table(spark, sf_dir, "documents")
    u = (md5_bucket("doc_id", _RES_COIN).cast("double") + 0.5) / float(_RES_COIN)
    key = F.round(F.log(u), 12) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("weight"),
            key.alias("aes_key"),
        )
        .orderBy(F.col("aes_key").desc(), "doc_id")
        .limit(RESERVOIR_K)
    )


STRAT_RESERVOIR_K = 8


@register(
    "stratified_weighted_reservoir",
    oracle=f"""
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight, aes_key
FROM (
    SELECT source, doc_id, n_chars,
           ROUND(LN(({md5_bucket_sql('doc_id', _RES_COIN)} + 0.5) / {_RES_COIN}.0), 12)
               / n_chars AS aes_key,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ROUND(LN(({md5_bucket_sql('doc_id', _RES_COIN)} + 0.5) / {_RES_COIN}.0), 12)
                        / n_chars DESC, doc_id) AS rn
    FROM documents
)
WHERE rn <= {STRAT_RESERVOIR_K}
""",
    tags=("sampling", "traindata", "llm"),
)
def stratified_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE weighted sampling without replacement: the A-ES key of
    ``weighted_reservoir_sample`` (same 12dp-rounded ln(u)/w, same md5
    coin) ranked WITHIN each source — a fixed-size w-proportional sample
    per stratum, the per-domain form every mixture pipeline needs
    (sample K docs from EACH source, longer docs proportionally
    likelier, reproducibly).

    Scale shape: rank-based per-group top-K is one window per source —
    a shuffle on source plus a per-partition sort.  The A-ES key's
    mergeability gives the heap alternative when strata are huge or
    skewed: aggregate a K-slot min-heap per source map-side
    (``max_by(..., K)`` in Spark 4), same result set, no full sort —
    the same trade the global sample's TakeOrderedAndProject makes."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    u = (md5_bucket("doc_id", _RES_COIN).cast("double") + 0.5) / float(_RES_COIN)
    key = F.round(F.log(u), 12) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(F.col("aes_key").desc(), "doc_id")
    return (
        d.select(
            "source",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            key.alias("aes_key"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= STRAT_RESERVOIR_K)
        .drop("rn")
    )


# --- Neyman-allocated stratified sampling (round 10) --------------------------
#
# Proportional stratified sampling (stratified_sample_events) spends the
# budget by stratum SIZE; Neyman allocation (Neyman 1934) spends it by
# N_h * S_h — strata with higher value variance get more of the budget,
# minimizing the variance of the stratified mean estimator.  The standard
# survey-sampling design, here fully deterministic: the per-stratum
# stddev comes from exact DECIMAL sums and the selection itself is the
# md5-hash order (the repo's repeatable-sample primitive).

NEYMAN_BUDGET = 1000


@register(
    "neyman_stratified_allocation",
    oracle=f"""
WITH s AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sxx
    FROM events GROUP BY event_type
), stats AS (
    SELECT event_type, n_rows,
           sqrt((sxx - sx * sx / n_rows) / n_rows) AS s_h
    FROM s
), alloc AS (
    SELECT event_type, n_rows, s_h,
           CAST(FLOOR(ROUND({NEYMAN_BUDGET} * (n_rows * s_h)
                / (SELECT SUM(n_rows * s_h) FROM stats), 6)) AS BIGINT) AS n_alloc
    FROM stats
), ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
    FROM events
), sample AS (
    SELECT r.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(CAST(r.value AS DECIMAL(18,2))) AS DOUBLE) AS sample_value_sum
    FROM ranked r JOIN alloc a USING (event_type)
    WHERE r.rn <= a.n_alloc
    GROUP BY r.event_type
)
SELECT a.event_type, a.n_rows, ROUND(a.s_h, 6) AS s_h, a.n_alloc,
       COALESCE(sm.n_sampled, 0) AS n_sampled,
       COALESCE(sm.sample_value_sum, 0.0) AS sample_value_sum
FROM alloc a LEFT JOIN sample sm USING (event_type)
""",
    tags=("sampling", "stratified"),
)
def neyman_stratified_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) allocation of a {budget}-row sample across
    event-type strata — n_h ∝ N_h·S_h — followed by the deterministic
    hash-order draw of each stratum's allocation, reporting the realized
    sample and its value mass per stratum.

    Cross-engine exactness: S_h comes from DECIMAL(18,6) power sums
    (bit-identical on both engines) fed through the same double
    sqrt/divide expression; the allocation ratio is rounded to 6dp
    before FLOOR so a last-ulp difference in the stratum-weight sum can
    never flip an integer allocation.  Scale shape: one aggregate for
    the stats (map-side combinable power sums), one per-stratum window
    for the draw (the hash order makes it a repeatable sample, the same
    primitive as hash_sample_lineitem), and the stratum count is small
    so the alloc table broadcasts into the rank filter.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    stats = s.select(
        "event_type",
        "n_rows",
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_rows"))
            / F.col("n_rows")
        ).alias("s_h"),
    )
    total_w = stats.agg(
        F.sum(F.col("n_rows") * F.col("s_h")).alias("w_total")
    )
    alloc = stats.crossJoin(F.broadcast(total_w)).select(
        "event_type",
        "n_rows",
        "s_h",
        F.floor(
            F.round(
                F.lit(NEYMAN_BUDGET) * (F.col("n_rows") * F.col("s_h")) / F.col("w_total"),
                6,
            )
        )
        .cast("bigint")
        .alias("n_alloc"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    ranked = e.select("event_type", "event_id", "value").withColumn(
        "rn", F.row_number().over(w)
    )
    sample = (
        ranked.join(F.broadcast(alloc.select("event_type", "n_alloc")), "event_type")
        .where(F.col("rn") <= F.col("n_alloc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sample_value_sum"),
        )
    )
    return alloc.join(sample, "event_type", "left").select(
        "event_type",
        "n_rows",
        F.round("s_h", 6).alias("s_h"),
        "n_alloc",
        F.coalesce("n_sampled", F.lit(0).cast("bigint")).alias("n_sampled"),
        F.coalesce("sample_value_sum", F.lit(0.0)).alias("sample_value_sum"),
    )
