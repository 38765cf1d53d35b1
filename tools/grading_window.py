"""Show the driver grading window and each query's last driver status.

The external grader runs only the FIRST 50 registry entries per round
(CORRECTNESS_r{N}.json). This tool keeps the rotation honest: it prints
the current window with each query's most recent driver verdict across
all CORRECTNESS_r*.json files, plus every query that has NEVER received
a driver row — the pool the next round's window must draw from.

Usage: python tools/grading_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> int:
    from feature_store_fraud_detection_spark.plans.registry import QUERIES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    history: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("err") == "no_oracle":
                # declared rows-only query: the driver records row count
                # only; >0 rows is the pass signal
                verdict = (
                    "rows-only (declared)"
                    if (row.get("spark_rows") or 0) > 0
                    else "rows-only ZERO ROWS"
                )
            elif row.get("err"):
                verdict = "ERR"
            elif row.get("hash_match"):
                verdict = "green"
            elif row.get("rows_match"):
                verdict = "rows-only/red-hash"
            else:
                verdict = "RED"
            history[name] = (rnd, verdict)

    names = list(QUERIES)
    print(f"registry: {len(names)} queries; window = first {WINDOW}\n")
    print("== grading window ==")
    for i, name in enumerate(names[:WINDOW]):
        rnd, verdict = history.get(name, (0, "never graded"))
        tag = f"r{rnd} {verdict}" if rnd else verdict
        print(f"{i + 1:3d}. {name:34s} {tag}")
    ungraded = [n for n in names[WINDOW:] if n not in history]
    stale = [
        (n, history[n]) for n in names[WINDOW:] if n in history
        and history[n][1] != "green"
    ]
    print(f"\n== outside the window, never graded ({len(ungraded)}) ==")
    for n in ungraded:
        print(f"     {n}")
    if stale:
        print("\n== outside the window, last verdict NOT green ==")
        for n, (rnd, verdict) in stale:
            print(f"     {n:34s} r{rnd} {verdict}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
