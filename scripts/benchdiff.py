#!/usr/bin/env python3
"""Per-query bench regression tripwire with host-drift normalization.

Diffs two bench artifacts — BENCH_r{N}.json wrappers (whose `tail` may
be front-truncated) or raw `graft.Bench` stdout files — and flags
queries whose NORMALIZED time grew by more than THRESHOLD (default
1.5x). Only queries visible in BOTH tails are comparable; the count of
each side's visible queries is printed so a silent truncation never
reads as "no regressions".

Host-drift normalization (the round-10 lesson, automated per the
round-10 verdict): artifact hosts drift — r10's driver host ran
code-frozen queries a median 1.20x slower than r9's, which manual
triage had to divide out before any flag meant anything. The tripwire
now does that division itself: the YARDSTICK ratio is the median
new/old ratio over three queries frozen since round 1
(q1_pricing_summary, q32_date_funcs, q25_moving_avg — pure CPU-bound
plans nobody edits), and every per-query ratio is divided by it before
flagging. Output shows BOTH raw and normalized ratios; the exit gate
uses the normalized one.

When an argument is a driver artifact BENCH_r{N}.json and a sibling
BENCH_LOCAL_r{N}.json exists (the builder's own clean-host bench stdout
with ALL per-query timings — the driver artifact's tail is
front-truncated to ~60 queries), the LOCAL file is preferred
automatically, so the diff covers the full query surface (r11 verdict
mandate #2).

Uniform-regression tripwire (r11 ADVICE, medium): normalization divides
out host drift, but it would also divide out a GENUINE uniform slowdown
(shared-infra change slowing every query including the yardstick trio).
So the exit gate additionally fails when the yardstick ratio itself, or
the raw total-time ratio, exceeds YARD_BOUND (default 1.75 — above any
host drift observed across rounds 1-11, max 1.20x). Pass --allow-drift
to downgrade that failure to a warning when the hosts are known to
differ (e.g. comparing a driver artifact against a local run).

Usage:
  python3 scripts/benchdiff.py BENCH_r07.json BENCH_r08.json [threshold]
  python3 scripts/benchdiff.py /tmp/bench_a.json /tmp/bench_b.json 1.3
  python3 scripts/benchdiff.py BENCH_r11.json BENCH_r12.json --allow-drift

Exit code 1 if any normalized regression above threshold, or (without
--allow-drift) on a uniform-slowdown tripwire hit.
"""
import json
import os
import re
import statistics
import sys

YARD_BOUND = float(os.environ.get("GRAFT_YARD_BOUND", "1.75"))

QUERY_RE = re.compile(r'"(q[0-9][^"]*)":([0-9.]+)')
TOTAL_RE = re.compile(r'"n_queries":(\d+),"value":([0-9.]+)')

# Frozen since round 1; if one is ever edited, replace it here and note
# the swap in README's bench-noise protocol.
YARDSTICK = ("q1_pricing_summary", "q32_date_funcs", "q25_moving_avg")


def prefer_local(path):
    """BENCH_r{N}.json → sibling BENCH_LOCAL_r{N}.json when present."""
    m = re.match(r"^(.*?)BENCH_(r\d+\.json)$", path)
    if m:
        local = f"{m.group(1)}BENCH_LOCAL_{m.group(2)}"
        if os.path.exists(local):
            print(f"using {local} (full per-query map) instead of {path}")
            return local
    return path


def load(path):
    """Return (per-query dict, (n_queries, total) or None)."""
    with open(path) as f:
        raw = f.read()
    try:
        wrapper = json.loads(raw)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            raw = wrapper["tail"]
        elif isinstance(wrapper, dict) and "queries" in wrapper:
            return dict(wrapper["queries"]), (
                wrapper.get("n_queries"), wrapper.get("value"))
    except (json.JSONDecodeError, ValueError):
        pass
    queries = {name: float(sec) for name, sec in QUERY_RE.findall(raw)}
    m = TOTAL_RE.search(raw)
    total = (int(m.group(1)), float(m.group(2))) if m else None
    return queries, total


def main():
    args = [a for a in sys.argv[1:] if a != "--allow-drift"]
    allow_drift = "--allow-drift" in sys.argv[1:]
    if len(args) < 2:
        sys.exit(__doc__)
    old_path, new_path = prefer_local(args[0]), prefer_local(args[1])
    threshold = float(args[2]) if len(args) > 2 else 1.5
    old, old_total = load(old_path)
    new, new_total = load(new_path)
    common = sorted(set(old) & set(new))
    print(f"old: {len(old)} queries visible"
          + (f", total {old_total[1]:.1f}s/{old_total[0]}" if old_total else ""))
    print(f"new: {len(new)} queries visible"
          + (f", total {new_total[1]:.1f}s/{new_total[0]}" if new_total else ""))

    yard_ratios = [new[q] / old[q] for q in YARDSTICK
                   if q in old and q in new and old[q] > 0]
    if yard_ratios:
        yard = statistics.median(yard_ratios)
        detail = ", ".join(
            f"{q}={new[q] / old[q]:.2f}x" for q in YARDSTICK
            if q in old and q in new and old[q] > 0)
        print(f"yardstick (host drift): {yard:.2f}x  [{detail}] — "
              f"per-query ratios below are divided by this before flagging")
    else:
        yard = 1.0
        print("yardstick: no frozen queries visible in both artifacts — "
              "ratios NOT normalized (treat flags with suspicion)")

    print(f"comparable: {len(common)}  (threshold {threshold}x normalized, "
          f"floor 0.2s — sub-floor queries are JVM noise)")
    regressions, improvements = [], []
    for q in common:
        a, b = old[q], new[q]
        raw_ratio = b / a if a > 0 else float("inf")
        norm = raw_ratio / yard
        if norm > threshold and b > 0.2:
            regressions.append((norm, raw_ratio, q, a, b))
        elif 1 / norm > threshold and a > 0.2:
            improvements.append((1 / norm, raw_ratio, q, a, b))
    for norm, raw_ratio, q, a, b in sorted(regressions, reverse=True):
        print(f"REGRESSION {q}: {a:.3f}s -> {b:.3f}s "
              f"(raw {raw_ratio:.2f}x, normalized {norm:.2f}x)")
    for norm, raw_ratio, q, a, b in sorted(improvements, reverse=True):
        print(f"improved   {q}: {a:.3f}s -> {b:.3f}s "
              f"(raw {raw_ratio:.2f}x, normalized {norm:.2f}x faster)")
    if not regressions:
        print("no normalized regressions above threshold")

    # Uniform-slowdown tripwire: a shared-infra regression inflates the
    # yardstick and divides itself out of every normalized ratio, so the
    # yardstick and the raw total get their own bound.
    uniform = []
    if yard > YARD_BOUND:
        uniform.append(f"yardstick ratio {yard:.2f}x exceeds bound "
                       f"{YARD_BOUND}x — either severe host drift or a "
                       f"UNIFORM regression in shared code paths")
    if old_total and new_total and old_total[1] > 0:
        total_ratio = new_total[1] / old_total[1]
        if total_ratio > YARD_BOUND and old_total[0] == new_total[0]:
            uniform.append(f"raw total {old_total[1]:.1f}s -> "
                           f"{new_total[1]:.1f}s ({total_ratio:.2f}x) exceeds "
                           f"bound {YARD_BOUND}x at equal query count")
    for msg in uniform:
        print(f"{'WARNING' if allow_drift else 'FAILURE'} (uniform tripwire): "
              f"{msg}")
    sys.exit(1 if regressions or (uniform and not allow_drift) else 0)


if __name__ == "__main__":
    main()
