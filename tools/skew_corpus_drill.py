"""Skewed-corpus drill for the LLM pipeline operators (VERDICT r12 #5).

BASELINE.md's skew-join drill covers relational joins; this is the
corpus-side equivalent: deliberately dominant-source / dominant-template
documents fixtures timed through the pipeline operators whose skew
bounds are designed and plan-pinned but were never exercised under
actual dominance.  Results are recorded in BASELINE.md ("Skewed-corpus
drill" section).

Fixtures (built once under --out, default /tmp/skew_drill; only a
``documents.parquet`` per fixture — the four drilled queries read no
other table):

- ``even``        sf0.1 documents replicated x20 (100k docs, doc_id
                  remapped to stay unique) with the original 20-source
                  uniform mix — the no-skew reference at drill scale.
- ``hot_source``  the same 100k docs with 90% reassigned to ONE
                  dominant source (md5 coin on doc_id), the power-law
                  corpus the pack-shard / block-window designs target.
- ``template20``/``template40``  the UNREPLICATED 5k docs with 20% / 40% rewritten to one
                  shared ~30-token boilerplate template plus a unique
                  per-doc suffix — the dominant-template corpus that
                  makes every template shingle's document frequency
                  ~1000 (>> MAX_SHINGLE_DF).  Unreplicated because the
                  UNMITIGATED pair expansion is O(hot_df^2) per shingle:
                  at x20 replication it would be ~5e9 pairs — the drill
                  demonstrates the cliff without falling off it.

Measurements (median of 3 warm runs each, local[32]):

1. packed_sequences     designed (source, md5-shard-of-doc_id window,
                        N_PACK_SHARDS=8) vs UNMITIGATED (source-only
                        window: the hot source's whole cumsum in one
                        task) on hot_source; designed-on-even reference.
2. jaccard_candidate_pairs  designed (DF cap 100 drops template
                        shingles before collect_list) vs UNMITIGATED
                        (cap 10^9: full hot-group pair expansion) on
                        template; designed-on-even-5k reference.
3. gini_concentration_by_source  designed only, hot_source vs even —
                        the bucket-scoped value-grain windows should
                        hold ~flat under source dominance.
4. stratified_eval_quota designed (two-phase hex-block top-Q) vs
                        UNMITIGATED (single per-stratum window) on
                        hot_source; designed-on-even reference.

Usage:  python tools/skew_corpus_drill.py [--out DIR] [--sf SF_DIR]
Prints one JSON line with every timing; paste the table into
BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPL = 20
HOT_FRACTION_BUCKETS = 9  # 9 of 10 md5 buckets -> 90% dominant source
TEMPLATE_BUCKETS = 2  # 2 of 10 -> 20% template docs
TEMPLATE = " ".join(
    f"boiler{i}" for i in range(30)
)  # one shared ~30-token boilerplate


def _coin(col: str, buckets: int) -> "F.Column":
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    ) < buckets


def build_fixtures(spark, sf_dir: str, out: str) -> dict[str, str]:
    from fawac_cdc_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    dirs = {}
    # even: x REPL replication, unique doc ids, sources untouched
    rep = d.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(REPL - 1))).alias("k")
    ).select(
        (F.col("doc_id") * REPL + F.col("k")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    for name, df in {
        "even": rep,
        "hot_source": rep.withColumn(
            "source",
            F.when(_coin("doc_id", HOT_FRACTION_BUCKETS), F.lit("hotsrc")).otherwise(
                F.col("source")
            ),
        ),
        "template20": d.withColumn(
            "text",
            F.when(
                _coin("doc_id", TEMPLATE_BUCKETS),
                F.concat(F.lit(TEMPLATE + " uniq"), F.col("doc_id").cast("string")),
            ).otherwise(F.col("text")),
        ).select("doc_id", "text", "lang", "source", "n_chars"),
        # doubled dominance: the unmitigated pair expansion is O(df^2)
        # per shingle, so 40% template should land ~4x the 20% cliff
        # while the DF-capped designed plan stays flat
        "template40": d.withColumn(
            "text",
            F.when(
                _coin("doc_id", 2 * TEMPLATE_BUCKETS),
                F.concat(F.lit(TEMPLATE + " uniq"), F.col("doc_id").cast("string")),
            ).otherwise(F.col("text")),
        ).select("doc_id", "text", "lang", "source", "n_chars"),
    }.items():
        path = os.path.join(out, name)
        df.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(path, "documents.parquet")
        )
        dirs[name] = path
    return dirs


def timed(make_df, runs: int = 3) -> float:
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        make_df().count()
        times.append(time.monotonic() - t0)
    return sorted(times)[len(times) // 2]


def packed_unmitigated(spark, sf_dir: str):
    """packed_sequences with the source-only window — the single-task
    straggler shape the pack shard exists to avoid."""
    from pyspark.sql import Window

    from fawac_cdc_spark.catalog import load_table
    from fawac_cdc_spark.functions.traindata import PACK_BUDGET

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", F.size(F.split("text", " ")).alias("ntok"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = t.withColumn(
        "tok_before", F.coalesce(F.sum("ntok").over(w), F.lit(0)).cast("long")
    )
    pack = (F.col("tok_before") / PACK_BUDGET).cast("long")
    return seq.groupBy("source", pack.alias("pack_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").cast("long").alias("pack_tokens"),
    )


def quota_unmitigated(spark, sf_dir: str):
    """stratified_eval_quota with ONE window per stratum — the whole
    hottest stratum in a single sort task."""
    from pyspark.sql import Window

    from fawac_cdc_spark.catalog import load_table
    from fawac_cdc_spark.functions.traindata import _EVAL_HASH_SQL, EVAL_QUOTA

    d = load_table(spark, sf_dir, "documents")
    base = d.select("source", "lang", "doc_id", F.expr(_EVAL_HASH_SQL).alias("h"))
    ws = Window.partitionBy("source", "lang").orderBy("h", "doc_id")
    return (
        base.withColumn("r", F.row_number().over(ws))
        .where(F.col("r") <= EVAL_QUOTA)
        .select("source", "lang", "doc_id", F.col("r").cast("int").alias("eval_rank"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/skew_drill")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from fawac_cdc_spark.functions.dedup import (
        MAX_SHINGLE_DF,
        _shingled_hashed,
        jaccard_candidate_pairs,
    )
    from fawac_cdc_spark.registry import all_specs
    from fawac_cdc_spark.session import get_spark

    spark = get_spark("skew-corpus-drill")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = build_fixtures(spark, args.sf, args.out)
    specs = all_specs()
    r: dict[str, float] = {}

    packed = specs["packed_sequences"].fn
    r["packed_designed_even"] = timed(lambda: packed(spark, dirs["even"]))
    r["packed_designed_hot"] = timed(lambda: packed(spark, dirs["hot_source"]))
    r["packed_unmitigated_hot"] = timed(
        lambda: packed_unmitigated(spark, dirs["hot_source"])
    )

    r["jaccard_designed_even5k"] = timed(
        lambda: jaccard_candidate_pairs(_shingled_hashed(spark, args.sf))
    )
    for frac in ("template20", "template40"):
        r[f"jaccard_designed_{frac}"] = timed(
            lambda f=frac: jaccard_candidate_pairs(_shingled_hashed(spark, dirs[f]))
        )
        r[f"jaccard_unmitigated_{frac}"] = timed(
            lambda f=frac: jaccard_candidate_pairs(
                _shingled_hashed(spark, dirs[f]), max_df=10**9
            ),
            runs=1,  # the cliff run: one observation is the point
        )

    gini = specs["gini_concentration_by_source"].fn
    r["gini_designed_even"] = timed(lambda: gini(spark, dirs["even"]))
    r["gini_designed_hot"] = timed(lambda: gini(spark, dirs["hot_source"]))

    quota = specs["stratified_eval_quota"].fn
    r["quota_designed_even"] = timed(lambda: quota(spark, dirs["even"]))
    r["quota_designed_hot"] = timed(lambda: quota(spark, dirs["hot_source"]))
    r["quota_unmitigated_hot"] = timed(
        lambda: quota_unmitigated(spark, dirs["hot_source"])
    )

    print(json.dumps({k: round(v, 3) for k, v in r.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
