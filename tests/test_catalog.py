from __future__ import annotations

from fawac_cdc_spark import catalog


def test_all_tables_load_with_contract_schema(spark, sf_dir):
    tables = catalog.load_tables(spark, sf_dir)
    assert set(tables) == set(catalog.TABLE_NAMES)
    for name, df in tables.items():
        expected = catalog.SCHEMAS[name]
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        want = {f.name: f.dataType.simpleString() for f in expected.fields}
        assert got == want, f"{name}: {got} != {want}"
        assert df.count() > 0


def test_register_views(spark, sf_dir):
    catalog.register_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n == 6000


def test_run_sql_entry_point(spark, sf_dir):
    """Ad-hoc SQL over the registered views — the escape hatch for
    queries outside the curated registry."""
    import fawac_cdc_spark as engine

    out = engine.run_sql(
        spark,
        sf_dir,
        """
        SELECT r_name, COUNT(*) AS n_nations
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
    ).collect()
    assert len(out) == 5
    assert sum(r["n_nations"] for r in out) == 25


def test_package_public_api():
    import fawac_cdc_spark as engine

    assert callable(engine.run_sql)
    assert len(engine.queries()) >= 80
    assert set(engine.oracle_sql()) <= set(engine.queries())
