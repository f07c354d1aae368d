#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify output
parquet against the DuckDB oracle and diff. Usage:
  python3 tools/check.py [sfDir] [outDir] [query...]
(Verify must have been run into outDir first.)"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0

# Freshness guard: Verify writes verify_manifest.json with the git SHA it ran
# at; refuse to hash outputs produced by a different commit (r7 post-mortem:
# three hash-reds traced to stale pre-fix parquet being compared as current).
import subprocess
mpath = f"{outdir}/verify_manifest.json"
if os.path.exists(mpath):
    man = json.load(open(mpath))
    try:
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=os.path.dirname(os.path.abspath(__file__)),
                              capture_output=True, text=True).stdout.strip()
    except Exception:
        head = ""
    if head and man.get("gitSha") not in ("", "unknown", head):
        print(f"FAIL <manifest>: Verify output is STALE — written at commit "
              f"{man.get('gitSha')[:10]} but HEAD is {head[:10]}; re-run Verify")
        fails += 1
    for fq in man.get("failed", []):
        print(f"FAIL {fq}: Verify recorded a runtime failure for this query")
        fails += 1
else:
    print("WARN <manifest>: no verify_manifest.json (pre-round-8 Verify output?)")
for name in sorted(only - set(oracle)):
    print(f"FAIL {name}: not in oracle_sql.json (stale Verify output?)")
    fails += 1
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    pq = f"{outdir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    # Driver-strict reads (r8 post-mortem: the three perennial hash-reds
    # were -0.0-vs-0.0, float64-vs-int64 and float64-vs-decimal diffs that
    # the old duckdb-roundtrip + lax `==` compare could not see):
    #  - Spark parquet via pyarrow — dtype-faithful (decimal stays Decimal,
    #    int64 stays int64), the way the driver reads it;
    #  - floats compared BITWISE (so -0.0 != 0.0, exactly like a value hash);
    #  - dtype-class mismatch (int vs float vs decimal/object) is a FAIL.
    import pyarrow.parquet as _pq
    import numpy as _np
    got = pd.concat([_pq.read_table(f).to_pandas()
                     for f in sorted(glob.glob(f"{pq}/*.parquet"))],
                    ignore_index=True)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails += 1
        continue
    dtbad = False
    for c in exp.columns:
        ka, kb = exp[c].dtype.kind, got[c].dtype.kind
        # normalize: treat int/uint as one class; bool separate; object
        # (strings/Decimals) separate; float separate
        cls = lambda k: {"i": "int", "u": "int"}.get(k, k)
        if cls(ka) != cls(kb):
            print(f"FAIL {name}: dtype class mismatch on {c}: "
                  f"oracle={exp[c].dtype} spark={got[c].dtype}")
            dtbad = True
    if dtbad:
        fails += 1
        continue
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    mismatch = 0
    for c in exp.columns:
        a, b = exp_s[c], got_s[c]
        if a.dtype.kind == 'f' and b.dtype.kind == 'f':
            # bitwise compare — the driver hashes values, so -0.0 != 0.0
            av = a.values.astype(_np.float64).view(_np.int64)
            bv = b.values.astype(_np.float64).view(_np.int64)
            bad = pd.Series((av != bv) & ~(a.isna() & b.isna()).values,
                            index=a.index)
        else:
            bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
        if bad.any():
            mismatch += int(bad.sum())
            i = bad.idxmax()
            print(f"  {name}.{c}: {int(bad.sum())} diffs, first at row {i}: exp={a[i]!r} got={b[i]!r}")
    if mismatch:
        print(f"FAIL {name}: {mismatch} value diffs ({len(exp)} rows)")
        fails += 1
    else:
        print(f"OK   {name} ({len(exp)} rows)")
print("RESULT:", "FAIL" if fails else "PASS", f"({len(oracle) if not only else len(only)} queries, {fails} failed)")
sys.exit(1 if fails else 0)
