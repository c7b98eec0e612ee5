"""Bucketed co-located join: the 100 TB shuffle-elimination path.

At scale the orders⋈lineitem fact-fact join is the dominant shuffle; the
production answer is bucketing both tables on the join key at write time
so the join becomes a zero-exchange sort-merge over co-located buckets
(README "100 TB scale notes"). This test demonstrates and pins that
plan: write both facts bucketed by orderkey, assert the join plan has NO
Exchange on either side, and assert results equal the shuffle join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fawac_cdc_spark.catalog import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_warehouse")
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"{table}_bucketed"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load_table(spark, sf_dir, table)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(wh / name))
            .saveAsTable(name)
        )
    yield "orders_bucketed", "lineitem_bucketed"
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def _joined(spark, o_name, l_name):
    o = spark.table(o_name)
    li = spark.table(l_name)
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity")).alias("qty"),
        )
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    o_name, l_name = bucketed_tables
    # force the SMJ path so the assertion is about bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _joined(spark, o_name, l_name)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # neither join input may shuffle: bucket layout co-locates keys.
        # The only Exchange allowed in the whole plan is the final
        # groupBy's — with a shuffle join there would be three.
        assert "SortMergeJoin" in plan
        assert plan.count("+- Exchange") + plan.count(":- Exchange") == 1, plan
        assert f"SelectedBucketsCount: {N_BUCKETS} out of {N_BUCKETS}" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_bucketed_join_matches_shuffle_join(spark, sf_dir, bucketed_tables):
    o_name, l_name = bucketed_tables
    got = _joined(spark, o_name, l_name).toPandas().sort_values("o_orderpriority")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity")).alias("qty"),
        )
        .toPandas()
        .sort_values("o_orderpriority")
    )
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
