"""Driver-proof type audit for every registry query.

The driver's correctness gate canonicalizes BOTH result sets through
pandas. Two classes of output types are hazardous there even when values
are semantically identical:

  1. Spark DecimalType / DuckDB DECIMAL & HUGEINT — pandas converts the
     DuckDB side to float64 while the Spark side stays object(Decimal) /
     int64, so str() canonicalization diverges ("12.50" vs 12.5,
     "500" vs 500.0) and the value hash goes red even though the local
     ``tools/check_oracle.py`` replica (repr-based, no pandas) is green.
     This is exactly what happened to the 5 round-2 hash-reds.
  2. array / map / struct columns — pandas ``sort_values`` raises
     ``TypeError: unhashable type: 'list'`` (round-1 ``multimodal_features``
     crash).

This tool flags every query whose Spark schema or DuckDB oracle result
contains one of those types so the boundary cast (double + round4_stable /
CAST(... AS BIGINT) / stringify) can be applied BEFORE the driver grades it.

Usage: python tools/check_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from feature_store_fraud_detection_spark.schemas import TESTDATA_TABLES  # noqa: E402
from feature_store_fraud_detection_spark.session import get_spark  # noqa: E402

SPARK_BAD = ("decimal", "array", "map", "struct")
DUCK_BAD = ("DECIMAL", "HUGEINT", "UHUGEINT", "[]", "STRUCT", "MAP", "LIST")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_types")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    flagged = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        bad = []
        try:
            sdf = fn(spark, sf_dir)
            for f in sdf.schema.fields:
                tn = f.dataType.simpleString()
                if any(b in tn for b in SPARK_BAD):
                    bad.append(f"spark:{f.name}:{tn}")
        except Exception as e:  # noqa: BLE001
            bad.append(f"spark:ERROR:{type(e).__name__}:{e}")
        if name in oracles:
            try:
                rows = con.execute(
                    f"DESCRIBE SELECT * FROM ({oracles[name]})"
                ).fetchall()
                for cname, tn, *_ in rows:
                    if any(b in tn for b in DUCK_BAD):
                        bad.append(f"duck:{cname}:{tn}")
            except Exception as e:  # noqa: BLE001
                bad.append(f"duck:ERROR:{type(e).__name__}:{e}")
        if bad:
            flagged.append(name)
            print(f"  {name:28s} {'; '.join(bad)}")
    print(f"\n{len(flagged)} flagged: {flagged}" if flagged else "\nALL CLEAN")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
