"""Min-of-N noop-sink timing for named queries (bench.py protocol,
single session, warmup first).  For same-session A/B measurement of
optimization candidates (guide §1.4).

Usage:
    python tools/ab_time.py <query> [query ...]   # SPARK_GRAFT_SF_DIR, _RUNS
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fawac_cdc_spark.registry import all_specs  # noqa: E402
from fawac_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark("ab-time")
    specs = all_specs()
    specs["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"{out[name]:8.3f}  {name}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
