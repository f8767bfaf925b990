#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
  - expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
  - loads outDir/<name>/ parquet per query and outDir/oracle_sql.json
  - registers each testdata table as a DuckDB view, runs the oracle SQL
  - sorts columns by name, sorts rows, compares values at the driver's bar:
    per-column dtype KIND must match BEFORE normalization (DuckDB HUGEINT ->
    float64 vs Spark int64 is a fail even when values compare equal), and
    float columns compare on raw bit patterns (so -0.0 != +0.0), because the
    driver hashes representations, not `==`-equality.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def kind_of(s: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(s): return "bool"
    if pd.api.types.is_float_dtype(s): return "float"
    if pd.api.types.is_integer_dtype(s): return "int"
    if pd.api.types.is_datetime64_any_dtype(s):
        # tz-aware vs naive is a SCHEMA fail at the driver (it hashes the
        # arrow type, which carries the tz) -- do not collapse the two.
        return "datetime[tz]" if getattr(s.dt, "tz", None) is not None else "datetime"
    return "object"

def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    kinds = {c: kind_of(df[c]) for c in df.columns}
    # normalize dtypes for compare (kind already captured above)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            df[c] = df[c].astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first").reset_index(drop=True)
    return df, kinds

def float_bits_eq(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Bitwise float64 equality: -0.0 != +0.0; NaN == NaN (any payload)."""
    abits = np.ascontiguousarray(a, dtype="float64").view("int64")
    bbits = np.ascontiguousarray(b, dtype="float64").view("int64")
    both_nan = np.isnan(a) & np.isnan(b)
    return (abits == bbits) | both_nan

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)])
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got, gkinds = canon(pq.read_table(files[0]).to_pandas())
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            want, wkinds = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        bad_kinds = [c for c in got.columns if gkinds[c] != wkinds[c]]
        if bad_kinds:
            det = ", ".join(f"{c}: spark={gkinds[c]} oracle={wkinds[c]}" for c in bad_kinds)
            print(f"FAIL {name}: dtype kind mismatch ({det})"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                eq = float_bits_eq(a.values, b.values)
            else:
                eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
            if not eq.all():
                i = int(np.argmin(eq))
                print(f"FAIL {name}: col {c} differs at row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
                ok = False; break
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
