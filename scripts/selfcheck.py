#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Loads oracle_sql.json, runs each SQL in DuckDB over the sf parquet tables,
loads the matching Spark parquet result, sorts columns by name and rows by
all columns, and diffs values.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            scur = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols = [d[0] for d in scur.description]
            srows = scur.fetchall()
            oc, orows2 = canon(orows, ocols)
            sc, srows2 = canon(srows, scols)
            if oc != sc:
                print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
                fail += 1
                continue
            if len(orows2) != len(srows2):
                print(f"FAIL {name}: rowcount oracle={len(orows2)} spark={len(srows2)}")
                fail += 1
                continue
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows2, srows2)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)} differing rows; first at {i}:")
                print(f"  oracle: {a}")
                print(f"  spark : {b}")
                fail += 1
            else:
                print(f"OK   {name} ({len(orows2)} rows)")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:300]}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

main()
