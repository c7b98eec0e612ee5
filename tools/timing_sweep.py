"""One-pass timing sweep of EVERY registered query at a given SF.

Not a regression gate (single run, noisy) — a cost PROFILE to rank
queries for optimization attention (guide §1: measure first).  Each
query is forced with the noop sink and labeled via setJobDescription.

Usage:
    python tools/timing_sweep.py [sf_dir] [out_json]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/timing_sweep.json"
    spark = get_spark("timing-sweep")
    specs = all_specs()
    # warmup: JVM + codegen + parquet footers
    specs["pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    for name, spec in specs.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"FAIL {name}: {e}", file=sys.stderr)
        print(f"{timings[name]:8.3f}  {name}", flush=True)
    with open(out, "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "timings": timings, "total": round(sum(timings.values()), 3)},
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"total {sum(timings.values()):.1f} s over {len(timings)} queries -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
