"""Degenerate-input robustness probe: run EVERY registry query against
a pathologically tiny dataset and classify the failures.

Motivation (round 10): the property-sweep program keeps finding the
same bug class — an ANSI divide-by-zero (or NULL-propagating aggregate)
fired by a degenerate denominator the full-size testdata never
exercises (zero variance, empty cohort, single-frequency spectrum,
all-censored panel). Sweeps find them one operator at a time; this
probe points the whole registry at a K-row slice of every table at
once.

Classification per query:

- OK            — ran and returned (possibly zero rows)
- NAMED-FAIL    — raised an error whose message names an operator or
                  query (the repo's fail-loud convention: acceptable)
- UNNAMED-FAIL  — raised a bare engine error (DIVIDE_BY_ZERO, cast
                  overflow, ...) with no operator name: the bug class
                  this tool exists to catch. Exit code 1 if any.

Usage: python tools/degenerate_probe.py [rows_per_table] [query ...]
       (default 1 row per table; a second run with e.g. 3 exercises
       slightly-less-degenerate shapes)
"""

from __future__ import annotations

import os
import re
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: error-message fragments that mark a DELIBERATE fail-loud (named):
#: USER_RAISED_EXCEPTION is Spark's wrapper for F.raise_error — every
#: in-plan fail-loud in this repo goes through it; the name pattern
#: catches "operator_name: ..." prefixes (head can't eat underscores so
#: bh_fdr:/sssp:-style names match); the fragments cover older wording.
NAMED_MARKERS = re.compile(
    r"USER_RAISED_EXCEPTION|\b[a-z][a-z0-9]*(?:[._][a-z0-9]+)*: \S|"
    r"needs at least|must be|undefined|degenerate|empty arm|empty corpus|"
    r"duplicate \(item",
)


def build_slice(src_dir: str, out_dir: str, k: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{src_dir}/{t}.parquet' LIMIT {k}) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = set(sys.argv[2:])

    from feature_store_fraud_detection_spark.plans.registry import QUERIES
    from feature_store_fraud_detection_spark.session import get_spark

    src = "/root/testdata/sf0.001"
    out = os.path.join(tempfile.gettempdir(), f"degenerate_sf_k{k}")
    build_slice(src, out, k)

    spark = get_spark(app_name="degenerate-probe")
    spark.sparkContext.setLogLevel("FATAL")
    results: dict[str, list[str]] = {"OK": [], "NAMED-FAIL": [],
                                     "UNNAMED-FAIL": []}
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            spec.fn(spark, out).limit(5000).collect()
            results["OK"].append(name)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc)
            # driver-side deliberate fail-louds raise ValueError (the
            # engine never does); everything in-plan goes through
            # F.raise_error -> USER_RAISED_EXCEPTION
            if isinstance(exc, (ValueError, AssertionError)) or (
                NAMED_MARKERS.search(msg)
            ):
                results["NAMED-FAIL"].append(name)
            else:
                results["UNNAMED-FAIL"].append(name)
                head = msg.strip().splitlines()[0][:160] if msg else (
                    traceback.format_exc().strip().splitlines()[-1][:160]
                )
                print(f"  UNNAMED {name}: {head}", flush=True)
        spark.catalog.clearCache()
    print(f"\nrows/table={k}  OK={len(results['OK'])}  "
          f"named-fail={len(results['NAMED-FAIL'])}  "
          f"UNNAMED-fail={len(results['UNNAMED-FAIL'])}")
    if results["NAMED-FAIL"]:
        print("named fail-louds (acceptable):")
        for n in results["NAMED-FAIL"]:
            print(f"    {n}")
    if results["UNNAMED-FAIL"]:
        print("UNNAMED failures (fix these):")
        for n in results["UNNAMED-FAIL"]:
            print(f"    {n}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
