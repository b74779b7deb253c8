#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: run each
oracle SQL over the sf parquet tables, read the Spark result parquet,
sort columns by name + rows, compare exactly."""
import sys, json, glob
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes = [], []
for q, sql in sorted(oracle.items()):
    try:
        ora = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((q, f"oracle SQL error: {e}")); continue
    files = glob.glob(f"{out}/{q}/*.parquet")
    if not files:
        fails.append((q, "no spark output")); continue
    spk = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    cols = sorted(ora.columns)
    if sorted(spk.columns) != cols:
        fails.append((q, f"columns differ: spark={sorted(spk.columns)} oracle={cols}")); continue
    o = ora[cols].sort_values(cols, ignore_index=True)
    s = spk[cols].sort_values(cols, ignore_index=True)
    if len(o) != len(s):
        fails.append((q, f"row count: spark={len(s)} oracle={len(o)}")); continue
    # dtype note (schema strictness unknown; report, don't fail)
    dtype_note = ""
    for c in cols:
        if str(o[c].dtype) != str(s[c].dtype):
            dtype_note += f" [dtype {c}: spark={s[c].dtype} oracle={o[c].dtype}]"
    try:
        pd.testing.assert_frame_equal(o, s, check_dtype=False, check_exact=True)
        passes.append((q, f"OK rows={len(o)}{dtype_note}"))
    except AssertionError as e:
        # find first differing cell
        diff = None
        for c in cols:
            neq = (o[c].astype(str) != s[c].astype(str))
            if neq.any():
                i = neq.idxmax()
                diff = f"col={c} row={i} oracle={o[c][i]!r} spark={s[c][i]!r}"
                break
        fails.append((q, f"VALUES differ: {diff}{dtype_note}"))

for q, m in passes: print(f"PASS {q}: {m}")
for q, m in fails: print(f"FAIL {q}: {m}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
