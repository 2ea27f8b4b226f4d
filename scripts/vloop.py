import importlib.util, sys
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.ansi.enabled", "true")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.sql.shuffle.partitions", "8")
         .getOrCreate())
df = mod.entry(spark)
print("ENTRY rows:", df.count(), flush=True)
sys.path.insert(0, "/root/repo")
from tests.parity import compare, duckdb_connect
con = duckdb_connect("/root/testdata/sf0.01")
qs, oracles = mod.queries(), mod.oracle_sql()
assert set(oracles) <= set(qs)
fails = []
for name in sorted(qs):
    d = qs[name](spark, "/root/testdata/sf0.01")
    if name in oracles:
        ok, msg = compare(d, con, oracles[name])
        if not ok: fails.append((name, msg))
    else:
        d.count()
print(f"TOTAL {len(qs)} queries, {len(oracles)} with oracles, {len(fails)} FAIL", flush=True)
for n, m in fails: print("FAIL", n, m[:200])
