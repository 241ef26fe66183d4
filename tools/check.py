#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's
parquet dump against the DuckDB oracle (sorted columns, sorted rows,
exact values). Dev tool only — not part of the engine."""
import duckdb, json, sys, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver fixtures are single files; Spark-written fixtures (e.g. the
    # ReseedFixture anti-overfitting corpus) are directories of parts
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    try:
        exp = con.execute(oracle[name]).fetchdf()
        got = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1
            continue
        if list(exp.dtypes) != list(got.dtypes):
            print(f"WARN {name}: dtypes exp={list(exp.dtypes)} got={list(got.dtypes)}")
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails += 1
            continue
        if not exp.equals(got):
            neq = (exp != got) & ~(exp.isna() & got.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()}/{len(exp)} rows differ; first:")
            print("  exp:", exp[bad].head(2).to_dict("records"))
            print("  got:", got[bad].head(2).to_dict("records"))
            fails += 1
            continue
        print(f"OK   {name} ({len(exp)} rows)")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails += 1
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
