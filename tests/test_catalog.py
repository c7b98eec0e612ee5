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
