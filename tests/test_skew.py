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
