#!/usr/bin/env python3
"""Write ``.explain("formatted")`` dumps for catalog queries WITHOUT
executing them (plan-shape evidence under ``plans/r12/``).

The dump is the initial AQE plan (``isFinalPlan=false``), the same thing
``df.explain("formatted")`` prints before an action — sufficient for the
structural claims the optimization notes make (Exchange placement, join
strategy, Python-eval node counts, PushedFilters).  Query CONSTRUCTION may
still run bounded jobs (model-sized collects, ``materialize_now`` cache
fills) because some catalog entries compute small driver-side tables while
building the plan; the final frame itself is never executed here.

Usage:
    python tools/dump_plan.py --tag after q1 q2 ...
    python tools/dump_plan.py --tag before --out /root/repo/plans/r12 q1 ...
      (run from a worktree of the pre-change commit to capture "before")
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    # the tag lands in a filename — reject anything path-like
    if os.sep in args.tag or (os.altsep and os.altsep in args.tag) \
            or args.tag in ("", ".", ".."):
        ap.error(f"--tag must be a bare filename suffix, got {args.tag!r}")

    from openskidata_processor_spark.plans import QUERIES
    from openskidata_processor_spark.session import get_spark

    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    def explain_text(df) -> str:
        # internal JVM path first (string without stdout capture); fall
        # back to capturing the public explain() if the private API moves
        # across Spark upgrades (ADVICE r12)
        try:
            mode = (spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
            return df._jdf.queryExecution().explainString(mode)
        except Exception:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue()

    for name in args.queries:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = explain_text(df)
        except Exception as exc:  # keep going: one bad dump must not stop the batch
            print(f"{name}: ERR {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
