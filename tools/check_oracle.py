"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf_dir, runs the
matching oracle_sql() through DuckDB on the same parquet, and compares:
row count, sorted column names, and an order-insensitive value hash
(canonicalized: timestamps -> isoformat(us), floats -> repr, None -> NULL).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from feature_store_fraud_detection_spark.schemas import TESTDATA_TABLES  # noqa: E402
from feature_store_fraud_detection_spark.session import get_spark  # noqa: E402


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v) * 1.0)
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat(timespec="microseconds")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows)} rows ({spark_s:.1f}s)")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        duck_s = time.time() - t0
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        sh = table_hash(scols, [tuple(r) for r in srows])
        dh = table_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK" if (ok_count and ok_schema and ok_hash) else "FAIL"
        schema_msg = "ok" if ok_schema else f"{sorted(scols)}!={sorted(dcols)}"
        hash_msg = "ok" if ok_hash else f"{sh}!={dh}"
        print(
            f"  {name:28s} {status}  rows={len(srows)}/{len(drows)} "
            f"schema={schema_msg} hash={hash_msg} "
            f"({spark_s:.1f}s spark / {duck_s:.1f}s duck)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_count and ok_schema:
                # show first differing rows for debugging
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted(
                    "|".join(_canon(r[i]) for i in order) for r in srows
                )
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = sorted(
                    "|".join(_canon(r[i]) for i in dorder) for r in drows
                )
                shown = 0
                for a, b in zip(sset, dset):
                    if a != b and shown < 3:
                        print(f"    spark: {a}\n    duck : {b}")
                        shown += 1
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
