#!/usr/bin/env python3
"""One-off: run multimodal_near_dup_groups once with the event log on and
print EVERY job (name, time, stage count) so the 50-job structure can be
attributed.  Also prints the CC iteration count via the stats hook."""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-jobdump"
import shutil

shutil.rmtree(EVDIR, ignore_errors=True)
os.makedirs(EVDIR, exist_ok=True)

from pyspark.sql import SparkSession

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.appName("jobdump")
         .master(f"local[{cpus}]")
         .config("spark.eventLog.enabled", "true")
         .config("spark.eventLog.dir", EVDIR)
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from openskidata_processor_spark.plans import QUERIES

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
df = QUERIES["multimodal_near_dup_groups"](spark, sf_dir)
import time

t0 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
print(f"wall: {time.monotonic() - t0:.2f}s")
spark.stop()

jobs = {}
stages = {}
for path in glob.glob(f"{EVDIR}/*"):
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "t0": ev.get("Submission Time", 0),
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", "")[:60],
                    "stages": [s["Stage ID"] for s in ev.get(
                        "Stage Infos", [])],
                    "name": "",
                }
            elif k == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0)
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", "")[:70],
                    "ms": si.get("Completion Time", 0)
                    - si.get("Submission Time", 0),
                    "tasks": si.get("Number of Tasks", 0),
                }

for jid in sorted(jobs):
    j = jobs[jid]
    dur = j.get("t1", 0) - j["t0"]
    parts = []
    for sid in j["stages"]:
        if sid in stages:
            s = stages[sid]
            parts.append(f"s{sid}:{s['ms']}ms/{s['tasks']}t:{s['name'][:40]}")
    print(f"job {jid:3d} {dur:6d} ms  {'; '.join(parts)}")
