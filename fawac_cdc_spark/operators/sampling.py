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
