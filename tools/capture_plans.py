"""Capture .explain("formatted") output for named queries to plans/<round>/.

Usage:
    python tools/capture_plans.py <suffix> [query ...]

With no query names: the frozen 20-query HEADLINE + 10-query EXT_HEADLINE.
Writes plans/<round>/<query>_<suffix>.txt (suffix = "before" / "after");
the round directory defaults to r16 and is overridable via
$SPARK_GRAFT_PLANS_ROUND.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from fawac_cdc_spark.registry import EXT_HEADLINE, all_specs  # noqa: E402
from fawac_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(dict.fromkeys(list(HEADLINE) + list(EXT_HEADLINE)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    specs = all_specs()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name}: {len(txt.splitlines())} plan lines -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
