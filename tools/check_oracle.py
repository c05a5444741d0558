#!/usr/bin/env python3
"""Dev harness mimicking the driver's t2 correctness gate:
for each SparkEntry query output under OUTDIR, run the paired DuckDB oracle
SQL over the same sf tables and compare (columns sorted by name, rows sorted,
exact value equality after each side's own rounding).

Usage: tools/check_oracle.py [sfDir] [outDir]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    # ScaleGen output (tools/ScaleGen.scala) writes each table as a
    # DIRECTORY of part files with events.ts as raw int64 nanos; the
    # fixture is a single file with nanos-typed ts. Same view either way.
    path = f"{sfdir}/{t}.parquet"
    if not os.path.exists(path):
        # partial ScaleGen directory (e.g. embeddings-only 100x probe) —
        # queries that touch the missing table fail loudly at oracle time
        continue
    src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
    cols = "*"
    if t == "events":
        (ts_type,) = [r[1] for r in
                      con.sql(f"DESCRIBE SELECT ts FROM {src}").fetchall()]
        if ts_type == "BIGINT":  # raw nanos -> micros timestamp
            cols = ("* REPLACE (make_timestamp(ts // 1000) AS ts)")
    con.sql(f"CREATE VIEW {t} AS SELECT {cols} FROM {src}")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = canon(pd.read_parquet(path))
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    bad = []
    for c in got.columns:
        a, b = got[c], exp[c]
        # normalize date/datetime representations (object-of-date vs
        # datetime64) before comparing values
        if ("datetime" in str(a.dtype) or "datetime" in str(b.dtype)
                or a.map(lambda x: hasattr(x, "year")).any()):
            try:
                a = pd.to_datetime(a); b = pd.to_datetime(b)
            except (ValueError, TypeError):
                pass
        try:
            an, bn = a.astype("float64"), b.astype("float64")
            eq = (an.values == bn.values) | (an.isna().values & bn.isna().values)
        except (ValueError, TypeError):
            eq = (a.astype(str).values == b.astype(str).values)
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append(f"{c}[{i}]: {a.iloc[i]!r} vs {b.iloc[i]!r} "
                       f"({int((~eq).sum())} diffs)")
    if bad:
        print(f"FAIL {name}: {bad[:3]}"); fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")

queries_no_oracle = [os.path.basename(p) for p in glob.glob(f"{outdir}/*")
                     if os.path.isdir(p) and os.path.basename(p) not in oracle]
for name in sorted(queries_no_oracle):
    try:
        n = len(pd.read_parquet(f"{outdir}/{name}"))
        print(f"ROWS-ONLY {name}: {n} rows")
    except Exception as e:
        print(f"FAIL {name} (rows-only): {e}"); fails += 1

sys.exit(1 if fails else 0)
