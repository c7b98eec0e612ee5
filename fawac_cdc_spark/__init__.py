"""fawac_cdc_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``PrajwalKoirala/FAWAC-CDC`` (see ``SURVEY.md``), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the CDC surface, and Arrow-batched pandas UDFs only where the
built-in operators genuinely cannot express the semantics (exact sequential
recurrences, model-inference-shaped ops).

Layout:
    catalog.py     — explicit schemas + loaders for the fixture tables
    session.py     — tuned local SparkSession factory (tests/bench only;
                     the driver passes its own session to ``__spark_entry__``)
    operators/     — relational operator surface (SURVEY.md §2)
    functions/     — scalar/array/text function library + LLM-data ops
    plans/         — composed reference-semantics pipelines (A18-A31, A44...)
    streaming/     — Structured Streaming CDC pipelines
    registry.py    — name -> (query fn, oracle SQL) registry backing
                     ``__spark_entry__.queries()`` / ``oracle_sql()``
"""

__version__ = "0.1.0"

from .catalog import load_table, load_tables, register_views, run_sql  # noqa: E402
from .registry import all_specs, oracle_sql, queries  # noqa: E402

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "run_sql",
    "all_specs",
    "queries",
    "oracle_sql",
    "__version__",
]
