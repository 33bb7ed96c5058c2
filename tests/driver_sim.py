"""Simulates the correctness driver: loads __spark_entry__.py by path from a
NEUTRAL cwd (not the repo), runs entry() smoke, then every queries() entry at
sf0.01 side-by-side with oracle_sql() in DuckDB, order-insensitive compare.

CAVEAT: the REAL driver's value hash is TYPE-SENSITIVE, while this sim (and
test_oracle_parity.py) normalizes ints through repr() — a DuckDB HUGEINT vs
Spark BIGINT drift passes here but fails the driver (round-8 lesson:
url_canonical_stats).  tests/test_oracle_types.py closes that gap by binding
every oracle and rejecting HUGEINT/UHUGEINT/DECIMAL(38 output columns; run it
(or `make window-check`) alongside this sim before shipping a rotation."""
import importlib.util, datetime, math, sys
import duckdb
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. entry smoke
rows = mod.entry(spark).collect()
print(f"entry(): {len(rows)} rows, schema={mod.entry(spark).columns}")
assert len(rows) > 0

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, (datetime.datetime, datetime.date)): return v.isoformat()
    if isinstance(v, float): return "nan" if math.isnan(v) else repr(round(v, 9))
    return repr(v)

qs, oracles = mod.queries(), mod.oracle_sql()
if "--window" in sys.argv:
    # Mirror the real driver exactly: it snapshots list(queries())[:50].
    keep = list(qs)[:50]
    qs = {k: qs[k] for k in keep}
    print(f"window mode: {len(qs)} queries (list(queries())[:50])")
fail = 0
for name, fn in sorted(qs.items()):
    df = fn(spark, SF)
    cols = [c.lower() for c in df.columns]
    data = [tuple(r) for r in df.collect()]
    if name not in oracles:
        print(f"  {name}: rows-only, {len(data)} rows OK")
        continue
    res = con.execute(oracles[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    left = sorted(tuple(norm(r[i]) for i in order) for r in data)
    right = sorted(tuple(norm(r[i]) for i in dorder) for r in drows)
    ok = sorted(cols) == sorted(dcols) and left == right
    print(f"  {name}: spark={len(left)} oracle={len(right)} match={ok}")
    if not ok:
        fail += 1
        diffs = [(a,b) for a,b in zip(left,right) if a!=b][:2]
        print("    first diffs:", diffs)
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
