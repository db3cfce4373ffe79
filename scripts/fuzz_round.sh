#!/bin/bash
# Whole-surface fuzz evidence for the round (r12 verdict mandate #4):
# runs scripts/fuzz.sh over EVERY SparkEntry query on each given seed
# and persists the per-query/per-seed pass-fail map as FUZZ_r{N}.json
# (the CORRECTNESS_r{N}.json of the adversarial gate).
#
# Usage: scripts/fuzz_round.sh <round> <seed> [seed...]
#   scripts/fuzz_round.sh 13 21 22 23   -> writes FUZZ_r13.json
set -e
cd "$(dirname "$0")/.."
ROUND="$1"; shift
OUT="FUZZ_r${ROUND}.json"
python3 - "$OUT" "$@" <<'PYEOF'
import json, subprocess, sys
out, seeds = sys.argv[1], sys.argv[2:]
result = {"seeds": {}, "n_queries": 0, "all_green": True}
for seed in seeds:
    p = subprocess.run(["scripts/fuzz.sh", seed], capture_output=True, text=True)
    per = {}
    for line in p.stdout.splitlines():
        if line.startswith(("PASS ", "FAIL ", "ERR  ")):
            status, name = line.split()[0], line.split()[1].rstrip(":")
            per[name] = status == "PASS"
    result["seeds"][seed] = {"rc": p.returncode, "queries": per,
                             "n_pass": sum(per.values()), "n": len(per)}
    result["n_queries"] = max(result["n_queries"], len(per))
    if p.returncode != 0 or not all(per.values()):
        result["all_green"] = False
    print(f"seed {seed}: {sum(per.values())}/{len(per)} rc={p.returncode}",
          flush=True)
with open(out, "w") as f:
    json.dump(result, f, indent=0, sort_keys=True)
print(f"wrote {out} all_green={result['all_green']}")
sys.exit(0 if result["all_green"] else 1)
PYEOF
