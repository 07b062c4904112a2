#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each
`graft.Verify` output parquet, run the matching oracle SQL in DuckDB over
the same scale-factor tables, sort columns by name + rows by all columns,
and compare values. Usage:
    python3 tools/check_oracle.py [verify_out_dir] [sf_dir]
"""
import duckdb, json, glob, os, sys
import pandas as pd
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    ok = True
    for c in got.columns:
        g, e = got[c], exp[c]
        # The driver's hash is TYPE-KIND-sensitive (r10-r12: DuckDB
        # HUGEINT/DOUBLE vs Spark BIGINT hashed red while this script's
        # astype coercion said green; int32-vs-int64 rows stayed green,
        # so width differences are fine). Mirror it: a dtype KIND
        # divergence (int vs float vs object/str vs bool) is a FAIL.
        if g.dtype.kind != e.dtype.kind:
            print(f"FAIL {name}: col {c} TYPE-MISMATCH "
                  f"{g.dtype} vs {e.dtype} (driver hash distinguishes "
                  f"int/float/str; CAST the oracle column)")
            ok = False
            continue
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            same = np.isclose(g.astype(float), e.astype(float),
                              rtol=0, atol=0, equal_nan=True)
            close = np.isclose(g.astype(float), e.astype(float),
                               rtol=1e-9, atol=1e-9, equal_nan=True)
            if not same.all():
                kind = "EXACT-MISMATCH" if close.all() else "VALUE-MISMATCH"
                bad = int((~same).sum())
                i = int(np.argmax(~np.asarray(same)))
                print(f"FAIL {name}: col {c} {kind} ({bad} rows), e.g. "
                      f"{g.iloc[i]!r} vs {e.iloc[i]!r}")
                ok = False
        else:
            eq = (g.astype(str).values == e.astype(str).values)
            if not eq.all():
                i = int(np.argmax(~eq))
                print(f"FAIL {name}: col {c} mismatch e.g. {g.iloc[i]!r} vs {e.iloc[i]!r}")
                ok = False
    if ok:
        print(f"PASS {name} ({len(got)} rows)")
    else:
        fails += 1
print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
