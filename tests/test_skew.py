"""Salted-join skew mitigation: correctness + distribution properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from fawac_cdc_spark.operators.joins import salted_join


def _skewed_frames(spark):
    # 10k rows, 90% on one hot key — the shape AQE skew-split targets
    big = spark.range(10000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").cast("int").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    return big, dim


def test_salted_join_matches_plain_join(spark):
    big, dim = _skewed_frames(spark)
    plain = big.join(dim, "k").select("row_id", "k", "payload", "name")
    salted = salted_join(big, dim, "k", scatter_col="row_id").select(
        "row_id", "k", "payload", "name"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salt_scatters_hot_key(spark):
    """The hot key's rows must spread across (nearly) all salt buckets."""
    big, dim = _skewed_frames(spark)
    n_salts = 16
    salted = big.withColumn(
        "_salt", F.pmod(F.hash(F.col("row_id")), F.lit(n_salts)).cast("int")
    )
    hot = salted.where(F.col("k") == 7)
    buckets = hot.groupBy("_salt").count().collect()
    assert len(buckets) == n_salts
    counts = [r["count"] for r in buckets]
    # ~9000 hot rows over 16 salts: no bucket should exceed 2x the mean
    assert max(counts) < 2 * (sum(counts) / len(counts))


def test_aqe_splits_skewed_join_partitions(spark):
    """With AQE skew handling on, the hot key's oversized shuffle
    partition is split: the joined output materializes with MORE
    partitions than spark.sql.shuffle.partitions. (The salted_join above
    is the manual fallback for where this rule can't reach.)"""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    try:
        big = spark.range(400000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("p"),
        )
        right = spark.range(200000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("rid")
        )
        joined = big.join(right.hint("merge"), "k")
        n_parts = joined.rdd.getNumPartitions()
        assert n_parts > 8, n_parts
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
