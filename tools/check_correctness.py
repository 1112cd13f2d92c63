#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL
in DuckDB over the testdata parquet tables, and compares against the
Spark parquet dump in <outDir>/<query>/ — columns sorted by name, rows
sorted, exact value equality (stricter than the driver's hash compare;
if this passes, the driver's gate passes).

Usage: python3 tools/check_correctness.py [sfDir] [outDir] [query ...]
"""
import duckdb, json, sys, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    try:
        sdf = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        fails += 1
        continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
        fails += 1
        continue
    # Type strictness: the driver's hash is TYPE-sensitive (DuckDB widens
    # windowed SUM(BIGINT) to HUGEINT etc.), so a value-equal result with
    # an int128 oracle column still fails the driver. Compare DuckDB's
    # view of both schemas and fail on any mismatch.
    stypes = dict(con.sql(
        f"SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM '{out}/{name}/*.parquet')"
    ).fetchall())
    otypes = dict(con.sql(
        f"SELECT column_name, column_type FROM (DESCRIBE {sql})").fetchall())
    tbad = [(c, stypes.get(c), otypes.get(c)) for c in scols
            if stypes.get(c) != otypes.get(c)]
    if tbad:
        c, st, ot = tbad[0]
        print(f"FAIL {name}: type mismatch col={c} spark={st} oracle={ot}")
        fails += 1
        continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        fails += 1
        continue
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    bad = None
    for c in scols:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            eq = (a == b) or (a is None and b is None)
            try:
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (math.isnan(a) and math.isnan(b)) or a == b
            except Exception:
                pass
            if not eq:
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: first mismatch col={c} row={i} spark={a!r} oracle={b!r}")
        fails += 1
    else:
        print(f"PASS {name} ({len(sdf)} rows, {len(scols)} cols)")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
