#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
reads Spark results (parquet dirs written by graft.Verify) + oracle_sql.json,
runs each oracle in DuckDB against the same testdata parquet tables, and
compares: columns sorted by name, rows sorted, values compared exactly
(with a small report of near-miss float diffs).

Usage: tools/validate.py [sfDir] [outDir] [query_filter_substr]
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FILT = sys.argv[3] if len(sys.argv) > 3 else ""

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def norm_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sc = [cols[i] for i in order]
    sr = sorted([tuple(canon(r[i]) for i in order) for r in rows],
                key=lambda t: tuple((x is None, str(x)) for x in t))
    return sc, sr

fail = ok = 0
for name in sorted(oracle):
    if FILT and FILT not in name: continue
    spark_dir = f"{OUT}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    st = pq.read_table(files[0])
    scols = st.column_names
    # column-major -> row-major
    cols_data = [st.column(j).to_pylist() for j in range(st.num_columns)]
    srows = list(zip(*cols_data)) if cols_data and st.num_rows else []
    try:
        res = con.execute(oracle[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fail += 1; continue
    sc, sr = norm_table(scols, srows)
    dc, dr = norm_table(dcols, drows)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duckdb={dc}"); fail += 1; continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rowcount spark={len(sr)} duckdb={len(dr)}"); fail += 1; continue
    bad = None
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            bad = (i, a, b); break
    if bad:
        i, a, b = bad
        diffs = [(sc[j], a[j], b[j]) for j in range(len(a)) if a[j] != b[j]]
        print(f"FAIL {name}: row {i} diffs {diffs[:4]}")
        fail += 1
    else:
        print(f"ok   {name} ({len(sr)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
