"""Single-run dispersion calibration for the headline suite.

Round 15 (VERDICT r14 #4): twice in a row a driver single-pass bench
total moved (+1%, +5.7%) while the like-for-like quiet min-of-5 on the
same code IMPROVED — the adjudication "that's single-run dispersion"
was correct both times but rested on inference, not a number.  This
tool measures the number ONCE: N fresh-session DRIVER-PROFILE runs of
the headline suite on one quiet host — i.e. exactly what one
BENCH_r{N}.json reading is: a single bench.py invocation with its
default min-of-3 per query (SPARK_GRAFT_BENCH_RUNS inherited, not
forced to 1) — recorded per query as min/median/max and the max/min
SPREAD ratio.  Future verdicts can then say "q10 +41% is
inside its measured single-run spread x1.6" with a committed artifact
(tools/bench_dispersion.json + the BASELINE.md table), and
tools/bench_compare.py annotates per-query regressions that fall
inside / outside their measured spread.

Run on a QUIET host only (the same discipline as the min-of-5 record):
    python tools/bench_dispersion.py [n_runs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(_REPO, "tools", "bench_dispersion.json")


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    runs: list[dict] = []
    for i in range(n_runs):
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(_REPO, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
        )
        line = proc.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        runs.append(rec)
        print(
            f"run {i + 1}/{n_runs}: total {rec['value']:.3f}s "
            f"probe {rec.get('probe_seconds')}->"
            f"{rec.get('probe_seconds_post')}",
            flush=True,
        )
    queries = sorted(runs[0]["queries"])
    per_query = {}
    for q in queries:
        vals = sorted(r["queries"][q] for r in runs)
        per_query[q] = {
            "min": vals[0],
            "median": round(statistics.median(vals), 3),
            "max": vals[-1],
            "spread": round(vals[-1] / vals[0], 3) if vals[0] else None,
            "values": vals,
        }
    totals = sorted(r["value"] for r in runs)
    probes = [
        p
        for r in runs
        for p in (r.get("probe_seconds"), r.get("probe_seconds_post"))
        if p
    ]
    record = {
        "n_runs": n_runs,
        "protocol": (
            "fresh-session driver-profile headline runs (bench.py "
            "default min-of-3 per query, headline-only), quiet host"
        ),
        "total": {
            "min": totals[0],
            "median": round(statistics.median(totals), 3),
            "max": totals[-1],
            "spread": round(totals[-1] / totals[0], 3),
        },
        "probe_range": [min(probes), max(probes)] if probes else None,
        "queries": per_query,
    }
    with open(OUT, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"dispersion record ({n_runs} runs) -> {OUT}")
    worst = sorted(
        per_query.items(), key=lambda kv: -(kv[1]["spread"] or 0)
    )[:5]
    for q, st in worst:
        print(
            f"  widest: {q}: {st['min']:.3f}..{st['max']:.3f} "
            f"(x{st['spread']:.2f})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
