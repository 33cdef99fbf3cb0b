#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query in
outDir/oracle_sql.json, run the SQL in DuckDB over the sfDir parquet tables
and compare cell-by-cell with the Spark parquet dump in outDir/<name>/.

Usage: compare.py <sfDir> <outDir>
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    t = pq.read_table(files[0])
    return t.to_pandas()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        # driver semantics: sort columns by name, then compare values
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1; continue
        bad = []
        for col in s.columns:
            sv, dv = list(s[col]), list(d[col])
            for i, (a, b) in enumerate(zip(sv, dv)):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan and b_nan:
                    continue
                # driver semantics: the gate hashes STRINGIFIED cells, so
                # Decimal('60000') vs 60000.0 must FAIL here even though
                # Python == says they're equal — compare renderings, not
                # values (this is how the r8 join_cardinality red slipped
                # past the old `a != b` check)
                if a_nan != b_nan or str(a) != str(b):
                    bad.append((col, i, a, b))
        if bad:
            print(f"FAIL {name}: {len(bad)} cell diffs; first 5:")
            for col, i, a, b in bad[:5]:
                print(f"   row {i} col {col}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    # rows-only queries (no oracle): just report row counts
    for d in sorted(os.listdir(outdir)):
        full = os.path.join(outdir, d)
        if os.path.isdir(full) and d not in oracle:
            df = load_spark(outdir, d)
            rows = 0 if df is None else len(df)
            status = "ROWS-ONLY-OK" if rows > 0 else "ROWS-ONLY-EMPTY"
            print(f"{status} {d} ({rows} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
