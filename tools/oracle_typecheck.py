#!/usr/bin/env python3
"""Flag oracle output columns whose DuckDB type is version-fragile for
the driver's hash compare: HUGEINT (uncast integer SUM — int128 whose
pandas/pyarrow rendering changed across DuckDB versions) and DECIMAL.
Usage: tools/oracle_typecheck.py [sfDir] [oracleJson]
"""
import sys, os, json
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_dump/oracle_sql.json"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(ORACLE))
FRAGILE = ("HUGEINT", "UHUGEINT", "DECIMAL")
n_flag = 0
for name in sorted(oracle):
    try:
        rows = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
    except Exception as e:
        print(f"ERR  {name}: {str(e)[:120]}")
        continue
    bad = [(c, ty) for (c, ty, *_ ) in rows if any(f in ty for f in FRAGILE)]
    if bad:
        n_flag += 1
        print(f"FLAG {name}: " + ", ".join(f"{c}:{ty}" for c, ty in bad))
print(f"-- {n_flag} flagged of {len(oracle)}")
