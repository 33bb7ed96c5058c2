#!/usr/bin/env python3
"""Per-query profiler: times catalog queries with the noop sink and labeled
jobs, and (optionally) dumps per-job/stage timing parsed from the Spark
event log so the cost can be attributed to stages rather than guessed.

Usage:
    python tools/profile_query.py q1 q2 ...          # time + stage summary
    python tools/profile_query.py --explain q1 ...   # also dump explain to
                                                     # plans/r12/<q>_<tag>.txt
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 (default)

Flags:
    --repeat N    run each query N times (first run = cold codegen)
    --tag NAME    suffix for explain files (before/after)
    --no-events   skip event-log parsing
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default="profile")
    ap.add_argument("--no-events", action="store_true")
    args = ap.parse_args()

    import shutil
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from pyspark.sql import SparkSession

    from openskidata_processor_spark.plans import QUERIES
    from openskidata_processor_spark.session import get_spark

    if not args.no_events:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        shuffle = os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32")
        builder = (
            SparkSession.builder.appName("profile")
            .master(f"local[{cpus}]")
            .config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", EVDIR)
        )
        # mirror get_spark's confs
        for k, v in {
            "spark.sql.shuffle.partitions": shuffle,
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.ansi.enabled": "true",
            "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "128m",
        }.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        from openskidata_processor_spark.session import ship_package
        ship_package(spark)
    else:
        spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # warmup (same as bench.py): JVM + python worker pool
    from pyspark.sql import functions as F
    QUERIES["a2_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    def _warm_fn(x):
        import numpy as np
        import pandas as pd  # noqa: F401
        return type(x)(np.asarray(x, dtype="float64") * 2.0)

    _warm = F.pandas_udf(_warm_fn, "double")
    par = spark.sparkContext.defaultParallelism
    (spark.range(par * 4).repartition(par)
     .select(_warm(F.col("id").cast("double")))
     .write.format("noop").mode("overwrite").save())

    results = {}
    for name in args.queries:
        for r in range(args.repeat):
            spark.sparkContext.setJobDescription(f"Q::{name}::{r}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results.setdefault(name, []).append(round(dt, 3))
            if args.explain and r == 0:
                out = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "plans", "r12", f"{name}_{args.tag}.txt")
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
                    .fromString("formatted")
                with open(out, "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(mode))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(results))
    spark.stop()

    if args.no_events:
        return
    # parse event logs: per job-description, total job time + top stages
    time.sleep(1.0)
    jobs = {}      # jobId -> (desc, submitted, completed)
    stages = {}    # stageId -> (name, submitted, completed, ntasks)
    job_stage = {}
    import subprocess
    paths = []
    for p in glob.glob(EVDIR + "/*"):
        if os.path.isdir(p):
            paths.extend(f for f in glob.glob(p + "/*")
                         if os.path.isfile(f) and "appstatus" not in f)
        else:
            paths.append(p)
    for path in paths:
        if ".zstd" in path:
            lines = subprocess.run(["zstd", "-dc", path],
                                   capture_output=True).stdout \
                .decode(errors="ignore").splitlines()
        else:
            lines = open(path, errors="ignore").read().splitlines()
        if True:
            for line in lines:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    desc = ev.get("Properties", {}).get(
                        "spark.job.description", "")
                    jobs[ev["Job ID"]] = [desc, ev.get("Submission Time"),
                                          None]
                    job_stage[ev["Job ID"]] = [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])]
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]][2] = ev.get("Completion Time")
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = (
                        si.get("Stage Name", ""),
                        si.get("Submission Time"),
                        si.get("Completion Time"),
                        si.get("Number of Tasks"))
    by_desc: dict[str, dict] = {}
    for jid, (desc, sub, comp) in sorted(jobs.items()):
        key = desc if desc.startswith("Q::") else "(other)"
        d = by_desc.setdefault(key, {"jobs": 0, "ms": 0, "stages": []})
        d["jobs"] += 1
        if sub and comp:
            d["ms"] += comp - sub
        for sid in job_stage.get(jid, []):
            if sid in stages:
                nm, ssub, scomp, nt = stages[sid]
                if ssub and scomp:
                    d["stages"].append((scomp - ssub, nt, sid, nm[:90]))
    for key, d in by_desc.items():
        print(f"\n== {key}: {d['jobs']} jobs, {d['ms']} ms job time")
        for ms, nt, sid, nm in sorted(d["stages"], reverse=True)[:12]:
            print(f"   stage {sid:4d} {ms:6d} ms  {nt:3d} tasks  {nm}")


if __name__ == "__main__":
    main()
