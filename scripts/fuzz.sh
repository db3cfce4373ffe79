#!/bin/bash
# Differential fuzzing vs DuckDB on generated adversarial data (the r11
# verdict mandate): regenerate a seeded hostile fixture (graft.Fuzz),
# dump every SparkEntry query on it (graft.Verify), then run the same
# oracle SQL in DuckDB over the same parquet and compare with the
# driver's strict pandas hasher (drivercheck.py — it sorts rows, like
# the driver's gate; precheck.py compares POSITIONALLY, which
# additionally asserts ORDER BY parity, and Spark orders NULL keys
# first where DuckDB orders them last, so on null-key fuzz data the
# positional check reports order-only differences the driver gate
# ignores).
#
# Usage: scripts/fuzz.sh <seed> [query...]   (see fuzz_round.sh for the
#        per-round whole-surface evidence artifact FUZZ_r{N}.json)
#   scripts/fuzz.sh 7                 # whole query surface (313 as of r13), seed 7
#   scripts/fuzz.sh 7 q210_mann_whitney q228_anova_f
set -e
cd "$(dirname "$0")/.."
SEED="$1"; shift || true
DIR=/tmp/graft-fuzz/seed$SEED
OUT=/tmp/graft-fuzz/out$SEED
scripts/run.sh graft.Fuzz "$SEED" "$DIR"
scripts/run.sh graft.Verify "$DIR" "$OUT" "$@" 2>&1 | grep -E '\[verify\]' || true
python3 scripts/drivercheck.py "$DIR" "$OUT" "$@"
