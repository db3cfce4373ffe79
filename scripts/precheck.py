#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY.md §5.3).

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB 1.0.0 over the
fixture parquet tables (registered as bare-named views), loads the Spark
result parquet the Verify main dumped, sorts columns by name on both sides,
and compares cell-by-cell with lossless value normalization. Converts
driver-round failures into edit-loop failures.
Usage:  python3 scripts/precheck.py <sfDir> <verifyOutDir> [query...]
"""
import datetime
import decimal
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def num_str(x):
    """Canonical no-trailing-zero decimal string."""
    s = format(x, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s or "0"


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        r = repr(v)
        return r[:-2] if r.endswith(".0") else r
    if isinstance(v, decimal.Decimal):
        return num_str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join("∅" if x is None else str(norm_cell(x)) for x in v) + "]"
    if isinstance(v, dict):
        return json.dumps({k: norm_cell(x) for k, x in sorted(v.items())})
    return str(v)


pd_ts_types = (datetime.datetime, datetime.date)


def rows_of(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(row[i]) for i in order) for row in data]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            # fixture tables are single files; fuzz fixtures (Spark-written)
            # are directories of part files — glob those
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result dir")
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(res_dir)
            s_cols = list(tbl.column_names)
            s_data = [tuple(d.values()) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: cannot read Spark result: {e}")
            n_fail += 1
            continue
        try:
            cur = con.execute(sql)
            d_cols = [d[0] for d in cur.description]
            d_data = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: DuckDB error: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        s_rows = rows_of(s_cols, s_data)
        d_rows = rows_of(d_cols, d_data)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            sc = sorted(s_cols)
            diffs = [(c, x, y) for c, x, y in zip(sc, a, b) if x != y]
            print(f"FAIL {name}: row {i} differs: {diffs[:4]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
