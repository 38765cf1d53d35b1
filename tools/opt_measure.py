"""Round-12 optimization measurement harness.

Times individual registry queries at a given SF with the bench's exact
methodology (sf0.001 codegen warmup, noop sink, min-of-N interleaved
passes, clearCache between runs) and captures the artifacts the
optimization round needs per query:

- ``plans/r12/<name>_<tag>.txt`` — ``explain("formatted")`` output;
- per-query job/stage counts (how many Spark jobs one query fires — the
  driver-side-loop detector: an operator that collects per field shows
  up as job count >> 1);
- per-query wall seconds (min over passes + the max/min noise marker).

Usage::

    python tools/opt_measure.py QUERY [QUERY ...] [--sf DIR] [--passes N]
        [--tag before|after] [--no-plans]

Prints one JSON line per query plus a final summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_fraud_detection_spark.plans.registry import QUERIES  # noqa: E402
from feature_store_fraud_detection_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument(
        "--plans-dir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r12",
        ),
    )
    args = ap.parse_args()

    names = list(dict.fromkeys(args.queries))
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="opt_measure")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    # bench-identical warmup: compile every measured query's codegen at the
    # tiny sf so Janino time never lands in a measured sample
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != args.sf:
        for n in names:
            QUERIES[n].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    spark.catalog.clearCache()

    if not args.no_plans:
        os.makedirs(args.plans_dir, exist_ok=True)
        for n in names:
            df = QUERIES[n].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{n}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
            spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in names}
    jobs: dict[str, int] = {}
    for _ in range(args.passes):
        for n in names:
            spark.sparkContext.setJobDescription(f"opt_measure:{n}")
            j0 = len(tracker.getJobIdsForGroup(None))
            all0 = tracker.getActiveJobsIds()  # noqa: F841 (warm the tracker)
            jid_before = max(
                (j for j in tracker.getJobIdsForGroup(None)), default=-1
            )
            t0 = time.time()
            QUERIES[n].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[n].append(time.time() - t0)
            jid_after = max(
                (j for j in tracker.getJobIdsForGroup(None)), default=-1
            )
            jobs[n] = jid_after - jid_before
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            del j0
    out = {}
    for n in names:
        s = samples[n]
        out[n] = {
            "sec": round(min(s), 3),
            "noise_max_over_min": round(max(s) / min(s), 3) if min(s) else None,
            "jobs": jobs[n],
        }
        print(json.dumps({"query": n, **out[n]}))
    print(
        json.dumps(
            {
                "sf": args.sf,
                "passes": args.passes,
                "total_sec": round(sum(v["sec"] for v in out.values()), 3),
                "queries": {n: v["sec"] for n, v in out.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
