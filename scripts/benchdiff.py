#!/usr/bin/env python3
"""Per-query bench regression tripwire.

Diffs two bench artifacts — BENCH_r{N}.json wrappers (whose `tail` may
be front-truncated) or raw `graft.Bench` stdout files — and flags
queries whose time grew by more than THRESHOLD (default 1.5x). Only
queries visible in BOTH tails are comparable; the count of each side's
visible queries is printed so a silent truncation never reads as "no
regressions".

Usage:
  python3 scripts/benchdiff.py BENCH_r07.json BENCH_r08.json [threshold]
  python3 scripts/benchdiff.py /tmp/bench_a.json /tmp/bench_b.json 1.3

Exit code 1 if any regression above threshold (for use as a gate).
"""
import json
import re
import sys

QUERY_RE = re.compile(r'"(q[0-9][^"]*)":([0-9.]+)')
TOTAL_RE = re.compile(r'"n_queries":(\d+),"value":([0-9.]+)')


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
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, old_total = load(old_path)
    new, new_total = load(new_path)
    common = sorted(set(old) & set(new))
    print(f"old: {len(old)} queries visible"
          + (f", total {old_total[1]:.1f}s/{old_total[0]}" if old_total else ""))
    print(f"new: {len(new)} queries visible"
          + (f", total {new_total[1]:.1f}s/{new_total[0]}" if new_total else ""))
    print(f"comparable: {len(common)}  (threshold {threshold}x, "
          f"floor 0.2s — sub-floor queries are JVM noise)")
    regressions, improvements = [], []
    for q in common:
        a, b = old[q], new[q]
        if b > a * threshold and b > 0.2:
            regressions.append((b / a, q, a, b))
        elif a > b * threshold and a > 0.2:
            improvements.append((a / b, q, a, b))
    for ratio, q, a, b in sorted(regressions, reverse=True):
        print(f"REGRESSION {q}: {a:.3f}s -> {b:.3f}s ({ratio:.2f}x)")
    for ratio, q, a, b in sorted(improvements, reverse=True):
        print(f"improved   {q}: {a:.3f}s -> {b:.3f}s ({ratio:.2f}x faster)")
    if not regressions:
        print("no regressions above threshold")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
