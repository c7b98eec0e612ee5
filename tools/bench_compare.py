"""Bench regression gate: compare a bench JSON line against a baseline.

The headline list is FROZEN (bench.py HEADLINE, 20 queries since round 3)
so rounds are comparable; this tool enforces the budget agreed in
VERDICT r3 item 7 and retuned in VERDICT r4 item 2: per-query tolerance
35% (min-of-3 on a shared 32-core host still has real per-query bounce —
the tight signal is the TOTAL, which gets its own 5% band).

Usage:
    python bench.py | tail -1 > /tmp/bench_now.json
    python tools/bench_compare.py BENCH_r04.json /tmp/bench_now.json \
        [per_query_tol_pct] [total_tol_pct]

The baseline may be a driver BENCH_r{N}.json (numbers under "parsed") or
a raw bench.py output line.
"""

from __future__ import annotations

import json
import os
import sys


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:  # driver wrapper
        doc = doc["parsed"]
    return doc


def load_dispersion() -> dict:
    """Per-query single-run spread ratios from the committed
    tools/bench_dispersion.json calibration (VERDICT r14 #4) — lets a
    per-query regression line say whether the reading is inside or
    outside its MEASURED fresh-session dispersion, so a driver
    single-pass uptick can be adjudicated with a number instead of an
    inference.  Informational only: rc semantics are unchanged.
    SPARK_GRAFT_DISPERSION overrides the path (tests)."""
    path = os.environ.get(
        "SPARK_GRAFT_DISPERSION",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_dispersion.json"),
    )
    try:
        with open(path) as f:
            rec = json.load(f)
        return {
            q: st["spread"]
            for q, st in rec.get("queries", {}).items()
            if st.get("spread")
        }
    except (OSError, ValueError):
        return {}


def main() -> int:
    base_path, now_path = sys.argv[1], sys.argv[2]
    tol = float(sys.argv[3]) / 100.0 if len(sys.argv) > 3 else 0.35
    total_tol = float(sys.argv[4]) / 100.0 if len(sys.argv) > 4 else 0.05
    base, now = load(base_path), load(now_path)
    dispersion = load_dispersion()
    failures: list[str] = []
    n_regressed = 0
    common = sorted(set(base["queries"]) & set(now["queries"]))
    for name in common:
        b, n = base["queries"][name], now["queries"][name]
        delta = (n - b) / b
        flag = "REGRESS" if delta > tol else "ok"
        note = ""
        if delta > tol and name in dispersion:
            spread = dispersion[name]
            side = "inside" if (1 + delta) <= spread else "OUTSIDE"
            note = (
                f" [{side} measured single-run spread x{spread:.2f}"
                " — BASELINE.md dispersion table]"
            )
        if delta > tol:
            n_regressed += 1
            failures.append(f"{name}: {b:.3f}s -> {n:.3f}s (+{delta:.0%})")
        print(f"[{flag}] {name}: {b:.3f} -> {n:.3f} ({delta:+.0%}){note}")
    missing = set(base["queries"]) - set(now["queries"])
    if missing:
        failures.append(f"queries missing from current run: {sorted(missing)}")
    # Extras (registry.BENCH_EXTRAS + skew experiments) are outside the
    # frozen total but get the same per-query band over the intersection —
    # without this, a non-headline operator could regress silently
    # between rounds (the set grows round to round, so only the overlap
    # is comparable and there is no extras total).
    extras_common = sorted(
        set(base.get("extras", {})) & set(now.get("extras", {}))
    )
    n_extra_regressed = 0
    for name in extras_common:
        b, n = base["extras"][name], now["extras"][name]
        delta = (n - b) / b
        flag = "REGRESS" if delta > tol else "ok"
        if delta > tol:
            n_extra_regressed += 1
            failures.append(
                f"extra {name}: {b:.3f}s -> {n:.3f}s (+{delta:.0%})"
            )
        print(f"[{flag}] extra {name}: {b:.3f} -> {n:.3f} ({delta:+.0%})")
    # the extras set only ever GROWS round to round; a baseline extra
    # vanishing from the current run means its benchmark crashed or was
    # dropped — fail like a missing headline query, don't skip it
    extras_missing = set(base.get("extras", {})) - set(now.get("extras", {}))
    if extras_missing:
        failures.append(
            f"extras missing from current run: {sorted(extras_missing)}"
        )
    bt, nt = base["value"], now["value"]
    print(f"total: {bt:.3f} -> {nt:.3f} ({(nt - bt) / bt:+.0%})")
    if nt > bt * (1 + total_tol):  # total gets a tighter band than per-query
        failures.append(f"total budget exceeded: {nt:.3f} > {bt:.3f}")
    # Frozen extension-headline total (registry.EXT_HEADLINE, round 13):
    # same band as the main total.  ext_value is the compact-record
    # total; full records carry the per-query ext_queries map (its
    # members also ride the extras gate above).  A baseline without ext
    # info (pre-round-13) bootstraps the gate instead of failing.
    def ext_total(doc: dict) -> float | None:
        if "ext_queries" in doc:
            return sum(doc["ext_queries"].values())
        return doc.get("ext_value")

    # Per-query ext gate (round 14, VERDICT r13 #2): when BOTH records
    # carry the ext_queries map (full bench records and the committed
    # tools/bench_ext_r{N}.json snapshots do; driver compact records
    # carry only ext_value), each frozen ext member gets the same
    # per-query band, and a vanished member fails like a missing
    # headline query.  This makes the frozen ext baseline a first-class
    # rc gate rather than a total-only check.
    ext_common = sorted(
        set(base.get("ext_queries", {})) & set(now.get("ext_queries", {}))
    )
    n_ext_regressed = 0
    for name in ext_common:
        b, n = base["ext_queries"][name], now["ext_queries"][name]
        delta = (n - b) / b
        flag = "REGRESS" if delta > tol else "ok"
        if delta > tol:
            n_ext_regressed += 1
            failures.append(f"ext {name}: {b:.3f}s -> {n:.3f}s (+{delta:.0%})")
        print(f"[{flag}] ext {name}: {b:.3f} -> {n:.3f} ({delta:+.0%})")
    # Vanished-member check only when BOTH records carry the map (ADVICE
    # r14): a compact driver record legitimately has ext_value only — an
    # absent ext_queries key is a record SHAPE, not ten crashed queries.
    if "ext_queries" in now:
        ext_missing = set(base.get("ext_queries", {})) - set(
            now["ext_queries"]
        )
        if ext_missing:
            failures.append(
                f"ext queries missing from current run: {sorted(ext_missing)}"
            )

    be, ne = ext_total(base), ext_total(now)
    if be is not None and ne is not None:
        print(f"ext total: {be:.3f} -> {ne:.3f} ({(ne - be) / be:+.0%})")
        if ne > be * (1 + total_tol):
            failures.append(f"ext total budget exceeded: {ne:.3f} > {be:.3f}")
    elif ne is not None:
        print(f"ext total: (no baseline) -> {ne:.3f} — ext gate bootstraps")
    # Host-calibration probes (round 14, VERDICT r13 #4; BOOKENDED round
    # 15, VERDICT r14 #3): bench.py times a fixed synthetic shuffle+agg
    # whose work never changes — once BEFORE the headline suite
    # (probe_seconds) and once AFTER the extras/ext suite
    # (probe_seconds_post) — so now/base on either reading is a pure
    # host-speed ratio, and post-vs-pre within the current run bounds
    # drift that started MID-session (drift on this host is monotone
    # within a session, so the r14 episode — clean pre-probe, drifted
    # ext section that runs last — is exactly what the post probe
    # catches).  Each SECTION is judged by its NEARER probe: the
    # headline/total section by the pre probe, the extras/ext section
    # (measured last) by the post probe when available (falling back to
    # pre — the probe is fixed work, so any baseline reading is a valid
    # host reference).  A section whose nearer probe is >15% slower than
    # baseline, or a >15% pre/post bookend disagreement (drift onset
    # unknown → everything between the bookends suspect), REFUSES TO
    # JUDGE (rc=2: re-run when quiet).  A faster host is annotated only
    # (it can mask a small true regression, but never invents one).
    bp, bp_post = base.get("probe_seconds"), base.get("probe_seconds_post")
    np_pre = now.get("probe_seconds")
    np_post = now.get("probe_seconds_post")
    pre_drift = post_drift = bookend = None
    if bp and np_pre:
        pre_drift = (np_pre - bp) / bp
        print(f"host probe (pre): {bp:.3f} -> {np_pre:.3f} ({pre_drift:+.0%})")
    elif np_pre:
        print(f"host probe: (no baseline) -> {np_pre:.3f} — probe bootstraps")
    late_base = bp_post or bp
    if late_base and np_post:
        post_drift = (np_post - late_base) / late_base
        print(
            f"host probe (post): {late_base:.3f} -> {np_post:.3f} "
            f"({post_drift:+.0%})"
        )
    elif np_post:
        print(
            f"host probe (post): (no baseline) -> {np_post:.3f} — "
            "probe bootstraps"
        )
    if np_pre and np_post:
        bookend = (np_post - np_pre) / np_pre
        print(f"probe bookends: {np_pre:.3f} -> {np_post:.3f} ({bookend:+.0%})")
    for f_ in failures:
        print(f"FAIL {f_}")
    print(f"{len(common) - n_regressed}/{len(common)} within budget")
    if ext_common:
        print(
            f"{len(ext_common) - n_ext_regressed}/{len(ext_common)} "
            "ext within budget"
        )
    if extras_common:
        print(
            f"{len(extras_common) - n_extra_regressed}/{len(extras_common)} "
            "extras within budget"
        )
    head_refused = pre_drift is not None and pre_drift > 0.15
    late_drift = post_drift if post_drift is not None else pre_drift
    # Bookend refusal is ONE-SIDED: drift on this host is monotone
    # SLOWER within a session, so only post > pre is contamination
    # evidence.  A faster post-probe is the normal session warm-up
    # signature (the round-15 dispersion calibration measured pre
    # 0.51-0.82 s vs post 0.37-0.52 s on five quiet runs — an abs()
    # rule would have refused every one of them).
    late_refused = (late_drift is not None and late_drift > 0.15) or (
        bookend is not None and bookend > 0.15
    )
    if head_refused:
        print(
            f"REFUSE-TO-JUDGE [headline]: host probe {pre_drift:+.0%} vs "
            "baseline session (tol +15%) — headline timings above are "
            "drift-contaminated; re-run on a quiet host (rc=2)"
        )
    if late_refused:
        why = (
            f"bookend disagreement {bookend:+.0%}"
            if bookend is not None and abs(bookend) > 0.15
            else f"nearer probe {late_drift:+.0%}"
        )
        print(
            f"REFUSE-TO-JUDGE [ext/extras]: {why} (tol 15%) — the "
            "late-running section's timings are drift-contaminated; "
            "re-run on a quiet host (rc=2)"
        )
    if head_refused or late_refused:
        return 2
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
