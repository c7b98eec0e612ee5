"""Dataset pre-processing operators (reference A38: ``pre_process_data``
call site ``train_fawac_iql.py:59-75``, params ``fawac_configs.py:18-24``).

The reference delegates to its RL library's pre-processing: outlier
removal, Gaussian noise injection, range inpainting, and density-based
stratified subsampling (``outliers_percent, noise_scale, inpaint_ranges,
density, cbins/rbins, max_npb/min_npb``). Outlier removal is
``outlier_filtered_totals`` (functions/scalars.py); this module covers
the other three, each fully deterministic so the oracle can replay it:

- noise injection uses md5-derived uniforms through a Box-Muller
  transform instead of ``randn(seed)`` — Spark's ``randn`` draws depend
  on partition layout, md5 depends only on row identity (portable AND
  repartition-stable, which `randn(seed)` is not).
- density subsampling caps rows-per-bin with a hash-ordered rank —
  the deterministic analog of the reference's per-bin ``max_npb`` cap.

Scale notes: all three are single-pass projections/filters; the
subsample's rank is a window per (type, bin) — bounded-cardinality
partitions, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.helpers import md5_int32, md5_int32_sql, money
from ..registry import register

NOISE_SCALE = 0.1  # reference default noise_scale
TWO32 = float(1 << 32)

INPAINT_RANGES = ((100.0, 150.0), (300.0, 350.0))  # value ranges to drop

BIN_WIDTH = 50  # value-histogram bin width (events.value spans ~[0, 500])
N_BINS = 10
MAX_NPB = 40  # max rows kept per (event_type, bin) — reference max_npb


@register(
    "noise_injected_values",
    oracle=f"""
SELECT event_id, value,
       ROUND(value + {NOISE_SCALE} *
             sqrt(-2 * ln(({md5_int32_sql("CAST(event_id AS VARCHAR)")} + 1)
                          / {TWO32})) *
             cos(2 * pi() * ({md5_int32_sql("CAST(event_id AS VARCHAR) || 'u2'")} + 1)
                          / {TWO32})
             + 1e-9, 6) AS noisy_value
FROM events
""",
    tags=("preprocess", "reference"),
)
def noise_injected_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian noise injection (A38 ``noise_scale``): z ~ N(0,1) via
    Box-Muller over two md5-derived uniforms keyed by event_id. Unlike
    ``randn(seed)`` the draw is a pure function of the row, so results
    survive repartitioning — and the oracle replays it exactly."""
    e = load_table(spark, sf_dir, "events")
    u1 = (md5_int32(F.col("event_id").cast("string")) + 1) / F.lit(TWO32)
    u2 = (
        md5_int32(F.concat(F.col("event_id").cast("string"), F.lit("u2"))) + 1
    ) / F.lit(TWO32)
    z = F.sqrt(-2 * F.log(u1)) * F.cos(2 * F.lit(3.141592653589793) * u2)
    return e.select(
        "event_id",
        "value",
        F.round(F.col("value") + F.lit(NOISE_SCALE) * z + 1e-9, 6).alias("noisy_value"),
    )


@register(
    "inpaint_range_filter",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_kept,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS kept_total
FROM events
WHERE NOT (value >= {INPAINT_RANGES[0][0]} AND value < {INPAINT_RANGES[0][1]})
  AND NOT (value >= {INPAINT_RANGES[1][0]} AND value < {INPAINT_RANGES[1][1]})
GROUP BY event_type
""",
    tags=("preprocess", "reference"),
)
def inpaint_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range inpainting (A38 ``inpaint_ranges``): drop rows whose value
    falls in the configured half-open ranges. Pure pushed-down
    predicates — at 100 TB this prunes at the scan."""
    e = load_table(spark, sf_dir, "events")
    keep = F.lit(True)
    for lo, hi in INPAINT_RANGES:
        keep = keep & ~((F.col("value") >= lo) & (F.col("value") < hi))
    return (
        e.where(keep)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(money("value")).cast("double").alias("kept_total"),
        )
    )


@register(
    "density_binned_subsample",
    oracle=f"""
WITH binned AS (
    SELECT event_type, event_id, value,
           CAST(LEAST(FLOOR(value / {BIN_WIDTH}), {N_BINS - 1}) AS INT) AS bin,
           ROW_NUMBER() OVER (
               PARTITION BY event_type,
                            CAST(LEAST(FLOOR(value / {BIN_WIDTH}), {N_BINS - 1}) AS INT)
               ORDER BY {md5_int32_sql("CAST(event_id AS VARCHAR)")}, event_id
           ) AS rk
    FROM events
)
SELECT event_type, bin,
       COUNT(*) AS n_kept,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS kept_total
FROM binned
WHERE rk <= {MAX_NPB}
GROUP BY event_type, bin
""",
    tags=("preprocess", "reference"),
)
def density_binned_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-stratified subsampling (A38 ``density/cbins/max_npb``):
    histogram rows into (event_type, value-bin) cells and keep at most
    MAX_NPB rows per cell, selected by md5-hash rank — dense cells are
    thinned, sparse cells pass through whole (the reference's per-bin
    cap). Hash rank makes the "random" survivors a deterministic,
    repartition-stable function of row identity."""
    e = load_table(spark, sf_dir, "events")
    bin_col = F.least(F.floor(F.col("value") / BIN_WIDTH), F.lit(N_BINS - 1)).cast(
        "int"
    )
    w = Window.partitionBy("event_type", "bin").orderBy(
        md5_int32(F.col("event_id").cast("string")), F.col("event_id")
    )
    binned = (
        e.withColumn("bin", bin_col)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= MAX_NPB)
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(money("value")).cast("double").alias("kept_total"),
    )


# Per-source adaptive quality cutoff (round 9): fixed global thresholds
# (Gopher-style) over-filter terse domains and under-filter verbose ones;
# the production alternative sets the cutoff PER SOURCE from that
# source's own distribution (C4/RefinedWeb-style adaptive filtering).
QUALITY_QUANTILE = 0.25


@register(
    "adaptive_source_quality_filter",
    oracle=f"""
WITH toks AS (
    SELECT source, len(string_split(text, ' ')) AS n_tokens FROM documents
), cuts AS (
    SELECT source,
           ROUND(quantile_cont(n_tokens, {QUALITY_QUANTILE}), 6) AS cutoff,
           CAST(COUNT(*) AS BIGINT) AS n_docs_total
    FROM toks GROUP BY source
), kept AS (
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(t.n_tokens) AS BIGINT) AS tokens_kept
    FROM toks t JOIN cuts c USING (source)
    WHERE t.n_tokens >= c.cutoff
    GROUP BY t.source
)
SELECT c.source, c.cutoff, c.n_docs_total, k.n_kept, k.tokens_kept
FROM cuts c JOIN kept k USING (source)
""",
    tags=("llm", "quality", "preprocess"),
)
def adaptive_source_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source adaptive quality gate: each source's token-count cutoff
    is ITS OWN exact 25th percentile, and only docs at or above it
    survive — per-domain thresholds instead of one global constant.

    Cross-engine determinism: the exact interpolated percentile differs
    from DuckDB's in the last ulp, so it is rounded(6) on BOTH sides
    BEFORE the filter comparison — the comparison then runs both engines
    against the identical cutoff double (the ``order_stats_with_median``
    precedent applied to a filter).  Scale: the exact percentile is a
    per-source sort — swap ``percentile_approx``/KLL when an epsilon is
    acceptable (same note as the median); the ~|sources|-row cutoff
    frame broadcasts back onto the scan, so the corpus side shuffles
    once for the percentile and once for the final per-source aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.size(F.split("text", " ")).alias("n_tokens"))
    cuts = toks.groupBy("source").agg(
        F.round(F.expr(f"percentile(n_tokens, {QUALITY_QUANTILE})"), 6).alias(
            "cutoff"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_docs_total"),
    )
    kept = (
        toks.join(F.broadcast(cuts.select("source", "cutoff")), "source")
        .where(F.col("n_tokens") >= F.col("cutoff"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        )
    )
    return cuts.join(kept, "source").select(
        "source", "cutoff", "n_docs_total", "n_kept", "tokens_kept"
    )
