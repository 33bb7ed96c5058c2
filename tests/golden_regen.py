"""Regenerate the pinned hashes in test_golden_outputs.GOLDEN.

Runs the full pipeline TWICE in independent temp dirs and refuses to print
pins unless both runs agree — a pin that isn't reproducible in one session
would flake forever.  Usage:  python tests/golden_regen.py
"""
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from pyspark.sql import SparkSession

from test_golden_outputs import compute_all_hashes

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .appName("golden-regen").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

h1 = compute_all_hashes(spark, tempfile.mkdtemp(prefix="golden1"))
h2 = compute_all_hashes(spark, tempfile.mkdtemp(prefix="golden2"))
diff = {k for k in h1 if h1[k] != h2[k]}
if diff:
    print("NONDETERMINISTIC — not printing pins:", sorted(diff))
    sys.exit(1)
print("GOLDEN = {")
for k, v in h1.items():
    print(f'    "{k}": "{v}",')
print("}")
