#!/usr/bin/env python3
"""Audit: find every cross-row accumulation (sum/avg, incl. window forms)
whose argument contains a libm-produced term (ln/log/exp/trig/pow —
anything NOT IEEE-correctly-rounded; sqrt and arithmetic are exempt).

The seed-122 bug class (round 15, q175/q242): each libm term carries
~1-ulp cross-engine drift, and SUMMING raw terms walks the drift onto a
rounding-grid boundary. The repo convention is to quantize every libm
term to nano-int (floor(x*1e9+0.5) as long) BEFORE the sum.

This script extracts candidate sites for adjudication; the enforcement
lint lives in LibmSumLintSpec.scala (same scan re-implemented in Scala
against an explicit allowlist). Usage: python3 scripts/libm_audit.py
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SRC = ROOT / "src" / "main" / "scala" / "graft"

# libm producers whose results are not correctly rounded per IEEE-754.
# sqrt is correctly rounded -> exempt. floor/abs/round are exact.
LIBM = re.compile(
    r"\b(ln|log|log10|log2|log1p|exp|expm1|sin|cos|tan|asin|acos|atan|"
    r"atan2|sinh|cosh|tanh|pow|power|cbrt)\s*\(",
    re.IGNORECASE,
)
ACC = re.compile(r"\b(sum|avg|mean)\s*\(", re.IGNORECASE)
# quantize wrapper evidence inside the accumulated argument
QUANT = re.compile(r"floor\s*\(", re.IGNORECASE)


def balanced_arg(text: str, open_idx: int) -> str:
    """Return text of the balanced-paren argument starting at '(' index."""
    depth = 0
    for j in range(open_idx, len(text)):
        c = text[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[open_idx : j + 1]
    return text[open_idx:]


def line_of(text: str, idx: int) -> int:
    return text.count("\n", 0, idx) + 1


# column-binding forms whose bound expression may carry raw libm taint
BIND_SCALA = re.compile(r'\.as\("([A-Za-z_][A-Za-z0-9_]*)"\)')
BIND_SQL = re.compile(r"\bAS\s+([A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE)
BIND_VAL = re.compile(r"\bval\s+([A-Za-z_][A-Za-z0-9_]*)\s*=")
BIND_WITHCOL = re.compile(r'withColumn\("([A-Za-z_][A-Za-z0-9_]*)"')


def tainted_names(text: str) -> set:
    """Names bound to an expression containing a raw (un-floored) libm
    call — approximated per-line: a line with a libm token, no floor(,
    and a binding. Good enough to surface two-step sum-by-name sites."""
    out = set()
    for line in text.split("\n"):
        if not LIBM.search(line) or QUANT.search(line):
            continue
        if line.lstrip().startswith(("//", "*", "/*")):
            continue  # prose comments bind nothing
        for pat in (BIND_SCALA, BIND_SQL, BIND_VAL, BIND_WITHCOL):
            for b in pat.finditer(line):
                n = b.group(1)
                # SQL CAST(x AS TYPE) binds type names, not columns
                if n.upper() in {
                    "DOUBLE", "BIGINT", "HUGEINT", "INT", "INTEGER",
                    "LONG", "VARCHAR", "DECIMAL", "FLOAT", "SMALLINT",
                    "DATE", "TIMESTAMP", "BOOLEAN", "REAL",
                }:
                    continue
                out.add(n)
    return out


def main() -> int:
    sites = []
    for f in sorted(SRC.rglob("*.scala")):
        text = f.read_text()
        taint = tainted_names(text)
        for m in ACC.finditer(text):
            arg = balanced_arg(text, m.end() - 1)
            libm_hits = LIBM.findall(arg)
            hit_taint = sorted(
                t for t in taint
                if re.search(r'[("\s]' + re.escape(t) + r'[)"\s,]', arg)
            )
            if not libm_hits and not hit_taint:
                continue
            if not libm_hits:
                libm_hits = ["via:" + ",".join(hit_taint)]
            # A quantized site still *contains* the libm token; record
            # whether a floor( quantizer wraps it so adjudication is easy.
            quantized = bool(QUANT.search(arg))
            ln = line_of(text, m.start())
            snippet = " ".join(arg.split())[:160]
            sites.append(
                (
                    str(f.relative_to(ROOT)),
                    ln,
                    m.group(1),
                    ",".join(sorted(set(h.lower() for h in libm_hits))),
                    "floor-wrapped" if quantized else "RAW",
                    snippet,
                )
            )
    for s in sites:
        print("\t".join(str(x) for x in s))
    print(f"# {len(sites)} candidate sites", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
