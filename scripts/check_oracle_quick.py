"""Mini driver-style correctness check: run queries() vs oracle_sql() on a
given sf dir, compare row count, column names, and sorted value multisets."""
import sys, math
import duckdb

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

from amundsendatabuilder_spark.session import get_spark
import __spark_entry__ as E

spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

qs, os_ = E.queries(), E.oracle_sql()
names = ONLY or [n for n in qs if n in os_]
for name in names:
    try:
        sdf = qs[name](spark, SF)
        scols = sorted(sdf.columns)
        srows = sorted(tuple(norm(r[c]) for c in scols) for r in sdf.collect())
        ddf = con.execute(os_[name]).fetch_arrow_table().to_pandas()
        dcols = sorted(ddf.columns)
        drows = sorted(tuple(norm(x) for x in t) for t in ddf[dcols].itertuples(index=False, name=None))
        ok_cols = scols == dcols
        ok_rows = len(srows) == len(drows)
        ok_vals = srows == drows
        status = "PASS" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(f"{name}: {status} spark={len(srows)} duck={len(drows)} cols={'OK' if ok_cols else (scols, dcols)}")
        if not ok_vals and ok_rows and ok_cols:
            for a, b in zip(srows, drows):
                if a != b:
                    print("   first diff:", a, "vs", b)
                    break
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
