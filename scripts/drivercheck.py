#!/usr/bin/env python3
"""Replica of the driver's pandas-based t2 hasher (the STRICT gate).

Unlike precheck.py (lossless value normalization), this mimics what the
driver actually does per CORRECTNESS_r01 evidence: load the Spark result
parquet with pandas, run the oracle SQL in DuckDB and take `.df()`, sort
columns by name, `sort_values` over all columns, then hash the values.
A decimal-vs-float64 dtype difference or an ndarray cell fails here even
when precheck.py passes — exactly the 26 round-1 reds.

Usage:  python3 scripts/drivercheck.py <sfDir> <verifyOutDir> [query...]
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd
from pandas.util import hash_pandas_object

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # Timestamp unit coercion: pandas reads Spark parquet as datetime64[ns]
    # while DuckDB .df() yields datetime64[us] (and date32 as object).
    # Round-1 driver evidence (q28/q32/q56/q58/q60/q62/q69 hash-green with
    # timestamp/date outputs) shows the driver coerces these — mirror it.
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            # Spark-written fuzz fixtures carry isAdjustedToUTC=true, so
            # DuckDB emits tz-aware outputs where the driver fixture
            # (pyarrow-naive) emits naive ones: same instant, different
            # dtype. Normalize to naive UTC before unit coercion.
            if getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object and df[c].map(
                lambda v: v is None or hasattr(v, "toordinal")).all() \
                and df[c].notna().any():
            df[c] = pd.to_datetime(df[c])
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def table_hash(df: pd.DataFrame) -> int:
    return int(hash_pandas_object(df, index=False).sum())


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
        try:
            s_df = canon(pd.read_parquet(Path(out_dir, name)))
            d_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        rows = len(s_df) == len(d_df)
        schema = list(s_df.columns) == list(d_df.columns)
        h = rows and schema and table_hash(s_df) == table_hash(d_df)
        if h:
            print(f"PASS {name} ({len(s_df)} rows)")
            n_pass += 1
        else:
            detail = ""
            if rows and schema:
                dt = [(c, str(s_df[c].dtype), str(d_df[c].dtype))
                      for c in s_df.columns
                      if str(s_df[c].dtype) != str(d_df[c].dtype)]
                if dt:
                    detail = f" dtype diffs: {dt[:4]}"
                else:
                    neq = (s_df != d_df) & ~(s_df.isna() & d_df.isna())
                    bad_cols = [c for c in s_df.columns if neq[c].any()]
                    detail = f" value diffs in cols: {bad_cols[:4]}"
            print(f"FAIL {name}: rows={rows} schema={schema}{detail}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
