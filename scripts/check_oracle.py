"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row count + schema-insensitive sorted value hash. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest(), len(lines)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from amundsendatabuilder_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows={len(rows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        if sorted(cols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(cols)} vs oracle {sorted(ocols)}")
            failures += 1
            continue
        h1, n1 = table_hash(cols, rows)
        h2, n2 = table_hash(ocols, orows)
        if n1 != n2:
            print(f"FAIL  {name}: rowcount {n1} vs {n2}")
            failures += 1
        elif h1 != h2:
            print(f"FAIL  {name}: value hash mismatch ({n1} rows)")
            failures += 1
        else:
            print(f"ok    {name}: rows={n1} hash match")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
