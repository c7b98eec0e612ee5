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

SEED = 42  # reference seed_all / TESTDATA seed


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
