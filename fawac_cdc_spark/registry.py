"""Query registry backing ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers here as a
``QuerySpec``: a callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL. The
driver's correctness gate runs both sides at sf0.01 and compares row count,
schema, and an order-insensitive value hash — so every computed column is
aliased identically on both sides, and float-producing aggregations either
go through exact DECIMAL arithmetic (bit-identical across engines) or are
explicitly rounded on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import.
_QUERY_MODULES = [
    "fawac_cdc_spark.operators.relational",
    "fawac_cdc_spark.operators.aggregates",
    "fawac_cdc_spark.operators.joins",
    "fawac_cdc_spark.operators.windows",
    "fawac_cdc_spark.operators.setops",
    "fawac_cdc_spark.operators.sampling",
    "fawac_cdc_spark.operators.tpch",
    "fawac_cdc_spark.functions.text",
    "fawac_cdc_spark.functions.scalars",
    "fawac_cdc_spark.functions.preprocess",
    "fawac_cdc_spark.functions.dedup",
    "fawac_cdc_spark.functions.similarity",
    "fawac_cdc_spark.functions.multimodal",
    "fawac_cdc_spark.sources.connectors",
    "fawac_cdc_spark.plans.reference",
    "fawac_cdc_spark.streaming.batch_equiv",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = field(default="")


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query fn under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
