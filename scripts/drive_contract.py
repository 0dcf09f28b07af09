import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())
print("ENTRY rows:", len(mod.entry(spark).collect()))
con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    p = f"/root/testdata/sf0.01/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
qs, osql = mod.queries(), mod.oracle_sql()
n_ok = n_ro = 0
for name in sorted(qs):
    try:
        sdf = qs[name](spark, "/root/testdata/sf0.01")
        srows = sorted(tuple(map(str, r)) for r in sdf.collect())
        if name in osql:
            drows = sorted(tuple(map(str, r))
                           for r in con.execute(osql[name]).fetchall())
            if srows == drows:
                n_ok += 1
            else:
                print(f"FAIL {name}")
        else:
            n_ro += 1
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {str(e)[:120]}")
print(f"SUMMARY oracle-matched={n_ok} rows-only={n_ro} total={len(qs)}")
spark.stop()
