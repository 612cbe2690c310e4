#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet and
compare (schema-insensitively: columns sorted by name, rows sorted, values
compared exactly; floats compared bit-exactly after float64 cast).

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--skip-verify]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'], cwd="/root/repo",
        capture_output=True, text=True, timeout=1800)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-3000:])
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); sys.exit(1)

oracle = json.loads((OUT / "oracle_sql.json").read_text())
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)  # final guard: driver-unknown, keep tight
            vals.append(repr(v))
        out.append("\x01".join(vals))
    return sorted(out), [cols[i] for i in order]

ok = fail = 0
declared = set(oracle)
for qdir in sorted(p for p in OUT.iterdir() if p.is_dir()):
    name = qdir.name
    try:
        sres = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
    except Exception as e:
        print(f"FAIL  {name}: spark result unreadable: {e}"); fail += 1; continue
    if name not in oracle:
        print(f"rows  {name}: no oracle, {len(srows)} rows")
        continue
    try:
        ores = con.execute(oracle[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
    except Exception as e:
        print(f"FAIL  {name}: oracle SQL error: {e}"); fail += 1; continue
    sc, scn = canon(srows, scols)
    oc, ocn = canon(orows, ocols)
    if scn != ocn:
        print(f"FAIL  {name}: columns {scn} vs {ocn}"); fail += 1; continue
    if len(sc) != len(oc):
        print(f"FAIL  {name}: rows {len(sc)} vs {len(oc)}"); fail += 1; continue
    if sc != oc:
        bad = next(i for i, (a, b) in enumerate(zip(sc, oc)) if a != b)
        print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
        print(f"      spark : {sc[bad][:300]}")
        print(f"      oracle: {oc[bad][:300]}")
        fail += 1; continue
    ok += 1
    print(f"OK    {name}: {len(sc)} rows")

missing = declared - {p.name for p in OUT.iterdir() if p.is_dir()}
for m in sorted(missing):
    print(f"FAIL  {m}: declared oracle but no spark result"); fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
