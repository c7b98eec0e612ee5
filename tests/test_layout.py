"""Data-layout operators: z-order locality, clustered writes, compaction.

The oracle-parity suite checks `zorder_bucket_stats` values; these tests
assert the *properties* that make the layout worth maintaining at scale:
z-buckets partition the (user × hour) area into small rectangles, a
z-clustered write produces files whose min/max footers actually prune,
and compaction hits its file-size target without losing rows.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from fawac_cdc_spark.catalog import load_table
from fawac_cdc_spark.operators.layout import compact_files, zorder_write
from fawac_cdc_spark.registry import all_specs


def _file_col_range(path: str, col: str):
    md = pq.read_metadata(path)
    names = md.schema.to_arrow_schema().names
    idx = names.index(col)
    mins, maxs = [], []
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(idx).statistics
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


def test_zorder_buckets_partition_the_area(spark, sf_dir):
    """Each z-bucket's (user × hour) rectangle must be a small fraction of
    the full domain area — the 2-D locality a single-column sort cannot
    give. (At sf0.001 the user domain is only 4 bits, so the user span
    alone can't always shrink; the AREA still must.)"""
    rows = all_specs()["zorder_bucket_stats"].fn(spark, sf_dir).collect()
    assert len(rows) > 4
    dom = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "max(user_id) - min(user_id) AS u",
            "(unix_micros(to_utc_timestamp(max(ts), 'UTC')) - "
            " unix_micros(to_utc_timestamp(min(ts), 'UTC'))) div 3600000000 AS h",
        )
        .collect()[0]
    )
    full_area = (dom["u"] + 1) * (dom["h"] + 1)
    big = [r for r in rows if r["n_events"] >= 10]
    assert big
    for r in big:
        area = (r["user_span"] + 1) * (r["hour_span"] + 1)
        assert area <= full_area / 3, (r, full_area)


def test_zorder_write_files_prune_on_stats(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "zorder")
    zorder_write(e, out, n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # footer min/max per file: a selective ts filter must be able to skip
    # files on stats alone (contiguous z-ranges bound the hour range).
    ranges = [
        _file_col_range(f, "ts") for f in glob.glob(f"{out}/*.parquet")
    ]
    assert len(ranges) > 1
    global_min = min(r[0] for r in ranges)
    assert any(r[0] > global_min for r in ranges), ranges


def test_compaction_hits_size_target_and_keeps_rows(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "events")
    small = str(tmp_path / "small")
    # simulate a streaming sink's debris: 64 tiny files
    e.repartition(64).write.parquet(small)
    assert len(glob.glob(f"{small}/*.parquet")) == 64
    out = str(tmp_path / "compact")
    n = compact_files(spark, small, out, target_mb=1, order_col="user_id")
    assert n <= 4
    assert spark.read.parquet(out).count() == e.count()
    # clustering preserved: user_id ranges across compacted files overlap
    # at most at the boundary key (range partition on the order column)
    stats = sorted(
        _file_col_range(f, "user_id") for f in glob.glob(f"{out}/*.parquet")
    )
    for (_a_min, a_max), (b_min, _b_max) in zip(stats, stats[1:]):
        assert a_max <= b_min + 1, stats


def test_runtime_bloom_filter_prunes_selective_fact_join(spark, sf_dir):
    """Spark's runtime row-level filtering: a selective filter on one side
    of a shuffle join injects a bloom filter into the other side's scan,
    so most probe rows drop BEFORE the shuffle — the 100 TB lever for
    selective fact-fact joins. Thresholds are tuned down because the
    test-scale scan is tiny; at 100 TB the defaults (10 GB application
    side) fire on their own."""
    from pyspark.sql import functions as F

    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 490000)
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "might_contain" in plan.lower() or "bloomfilter" in plan.lower(), (
            plan[:1500]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
