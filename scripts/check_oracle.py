#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare values (columns sorted by name, rows
sorted, floats compared exactly-after-round like a hash would)."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails, passes, rows_only = [], [], []
for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    pq = glob.glob(f"{qdir}/*.parquet")
    if not pq:
        fails.append((name, "no parquet output")); continue
    got = pd.read_parquet(qdir)
    if name not in oracle:
        rows_only.append((name, len(got))); continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"columns differ: got {list(g.columns)} vs {list(e.columns)}")); continue
    if len(g) != len(e):
        fails.append((name, f"row count: got {len(g)} vs {len(e)}")); continue
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        # Driver hashes stringified values, so int64 26 vs float64 26.0
        # mismatch even when numerically equal — treat kind skew as FAIL.
        if (gv.dtype.kind in 'iu') != (ev.dtype.kind in 'iu') and \
           {gv.dtype.kind, ev.dtype.kind} & {'f'}:
            bad = (f"col {c}: dtype kind skew (spark {gv.dtype} vs "
                   f"oracle {ev.dtype}) — driver str-hash would differ"); break
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            ga = gv.astype(float).to_numpy(); ea = ev.astype(float).to_numpy()
            ok = np.isclose(ga, ea, rtol=0, atol=1e-9, equal_nan=True)
            exact = (ga == ea) | (np.isnan(ga) & np.isnan(ea))
            if not ok.all():
                bad = f"col {c}: {int((~ok).sum())} mismatches, e.g. {ga[~ok][:3]} vs {ea[~ok][:3]}"; break
            if not exact.all():
                bad = f"col {c}: NONEXACT float ({int((~exact).sum())} rows differ in last bits)"; break
        elif gv.dtype.kind == 'M' or ev.dtype.kind == 'M':
            if not (pd.to_datetime(gv).astype('datetime64[us]') == pd.to_datetime(ev).astype('datetime64[us]')).all():
                bad = f"col {c}: timestamp mismatch"; break
        else:
            if not (gv.astype(str).to_numpy() == ev.astype(str).to_numpy()).all():
                m = (gv.astype(str).to_numpy() != ev.astype(str).to_numpy())
                bad = f"col {c}: {int(m.sum())} mismatches, e.g. got {gv[m][:3].tolist()} vs {ev[m][:3].tolist()}"; break
    if bad: fails.append((name, bad))
    else: passes.append(name)

# A query that crashed inside Verify leaves NO output dir and would be
# invisible to the dir scan above — flag every attempted query (Verify
# writes queries.json FIRST, so even a whole-process crash leaves the
# manifest). A missing manifest is itself a failure: it means Verify
# died before doing anything, and silently passing the dir scan would
# reopen the round-4 vanishing-queries window.
qlist = f"{out_dir}/queries.json"
if os.path.exists(qlist):
    seen = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{out_dir}/*/")}
    for name in json.load(open(qlist)):
        if name not in seen:
            fails.append((name, "no output dir — query failed inside Verify"))
else:
    fails.append(("queries.json", "manifest missing — Verify died before the query loop"))

print(f"PASS ({len(passes)}):", " ".join(passes))
print(f"ROWS-ONLY ({len(rows_only)}):", " ".join(f"{n}={r}" for n, r in rows_only))
print(f"FAIL ({len(fails)}):")
for n, msg in fails: print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)
