"""Driver-contract simulation (verify skill recipe): run entry(),
then each named query (default: first 50 of queries()) on Spark at
sf0.01 AND its oracle_sql() in DuckDB; compare sorted-by-name columns,
row count, and an order-insensitive md5 of stringified rows. Exit
nonzero on any mismatch."""
import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .appName("drive_entry")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

df = entrymod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()[:100]}")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = entrymod.queries()
orc = entrymod.oracle_sql()
names = sys.argv[1:] or list(qs)[:50]


def canon_rows(cols, rows):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = repr(round(v, 9))
            elif hasattr(v, "as_tuple"):
                v = repr(round(float(v), 9))
            else:
                v = str(v)
            vals.append(v)
        out.append("|".join(vals))
    h = hashlib.md5()
    for line in sorted(out):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


fails = []
for name in names:
    try:
        sdf = qs[name](spark, SF)
        scols = sorted(c.lower() for c in sdf.columns)
        srows = [
            {c.lower(): v for c, v in r.asDict().items()} for r in sdf.collect()
        ]
        spark.catalog.clearCache()
        if name not in orc:
            print(f"{name}: no_oracle spark_rows={len(srows)}")
            continue
        od = con.sql(orc[name])
        ocols = sorted(c.lower() for c in od.columns)
        orows = [dict(zip([c.lower() for c in od.columns], t)) for t in od.fetchall()]
        ok_rows = len(srows) == len(orows)
        ok_schema = scols == ocols
        ok_hash = (
            ok_rows
            and ok_schema
            and canon_rows(scols, srows) == canon_rows(ocols, orows)
        )
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={ok_schema} hash={ok_hash}"
        )
        if status == "FAIL":
            fails.append(name)
    except Exception as exc:
        print(f"{name}: ERROR {type(exc).__name__}: {exc}")
        fails.append(name)

print(f"checked={len(names)} failed={len(fails)} {fails}")
sys.exit(1 if fails else 0)
