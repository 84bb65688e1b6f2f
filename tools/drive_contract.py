"""Drive the __spark_entry__ contract like the grading driver: fresh
plain Spark session, every queries() entry vs its oracle_sql() twin on
DuckDB at sf0.01 (row count + sorted column names + order-insensitive
value hash), entry(spark) smoke twice."""

import datetime
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("drive_contract")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    only = set(sys.argv[1:])
    fails = []
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = build(spark, SF)
            rows = df.collect()
            cols = df.columns
            sql = oracles.get(name)
            if sql is None:
                print(f"{name}: rows-only {len(rows)} rows")
                continue
            cur = con.execute(sql)
            orows = cur.fetchall()
            ocols = [d[0] for d in cur.description]
            ok_rows = len(rows) == len(orows)
            ok_schema = sorted(cols) == sorted(ocols)
            ok_hash = value_hash(cols, [tuple(r) for r in rows]) == value_hash(
                ocols, orows
            )
            status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
            if status == "FAIL":
                fails.append(name)
                print(
                    f"{name}: FAIL rows {len(rows)}/{len(orows)} "
                    f"schema_ok={ok_schema} hash_ok={ok_hash} "
                    f"cols={sorted(cols)} ocols={sorted(ocols)}"
                )
            else:
                print(f"{name}: OK {len(rows)} rows {time.time()-t0:.1f}s")
        except Exception as ex:
            fails.append(name)
            print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:300]}")

    if not only:
        e1 = E.entry(spark)
        n1, s1 = e1.count(), e1.schema.simpleString()
        e2 = E.entry(spark)
        n2, s2 = e2.count(), e2.schema.simpleString()
        assert n1 >= 0 and s1 == s2, (n1, s1, s2)
        print(f"entry(): {n1} rows, stable schema")

    print("FAILS:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
