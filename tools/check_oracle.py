#!/usr/bin/env python3
"""Local stand-in for the driver's t2 check: run DuckDB oracle SQL against
the sf parquet tables and hash-compare with the Spark parquet dumps
produced by graft.Verify. Columns sorted by name; values stringified."""
import duckdb, json, sys, glob, os, math

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"create view {name} as select * from '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                # bit-exact: the driver may hash exact values, so a 1-ulp
                # divergence must fail here too
                vals.append("null" if math.isnan(v) else v.hex())
            elif v is None or v != v:
                vals.append("null")
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    return rows

fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"MISS  {name}: no spark output"); fails += 1; continue
    try:
        o = con.sql(sql).df()
    except Exception as e:
        print(f"ORAERR {name}: {e}"); fails += 1; continue
    s = con.sql(f"select * from '{spark_files[0]}'").df()
    co, cs = canon(o), canon(s)
    if sorted(o.columns.str.lower()) != sorted(s.columns.str.lower()):
        print(f"SCHEMA {name}: oracle={sorted(o.columns)} spark={sorted(s.columns)}"); fails += 1
    elif co != cs:
        n = sum(1 for a, b in zip(co, cs) if a != b) + abs(len(co) - len(cs))
        print(f"DIFF  {name}: rows oracle={len(co)} spark={len(cs)}, {n} differing")
        for a, b in list(zip(co, cs))[:5]:
            if a != b: print(f"   o: {a}\n   s: {b}")
        fails += 1
    else:
        print(f"OK    {name} ({len(co)} rows)")
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
