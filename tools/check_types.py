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

It ALSO statically scans the Spark operator sources for the r6 red-row
hazard class on the ENGINE side: ``F.sum(<a> * <b>)`` where the product is
not lifted into DECIMAL(38,0) — in non-ANSI Spark a BIGINT product/sum
WRAPS silently past int64 while the DuckDB twin widens to HUGEINT and stays
exact, so the first symptom is a red value-hash at a scale nobody tested.
The scan is AST-based over the literal inline-product idiom the operators
use (``F.sum(x * y)`` / ``F.sum((x * y).cast(...))``); a product whose
enclosing sum argument carries a ``decimal`` cast is considered guarded,
and a knowingly-bounded product can be waived with an ``# int-ok:`` comment
on the product's line explaining WHY it cannot overflow.

Usage: python tools/check_types.py [sf_dir] [query ...]
       python tools/check_types.py --scan-source      (static scan only)
"""

from __future__ import annotations

import ast
import glob
import os
import sys

sys.path.insert(0, "/root/repo")

SPARK_BAD = ("decimal", "array", "map", "struct")
DUCK_BAD = ("DECIMAL", "HUGEINT", "UHUGEINT", "[]", "STRUCT", "MAP", "LIST")

_PKG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "feature_store_fraud_detection_spark",
)


def _has_decimal_cast(node: ast.AST) -> bool:
    """True if any .cast('decimal...') appears in the subtree."""
    for sub in ast.walk(node):
        if (
            isinstance(sub, ast.Call)
            and isinstance(sub.func, ast.Attribute)
            and sub.func.attr == "cast"
            and sub.args
            and isinstance(sub.args[0], ast.Constant)
            and isinstance(sub.args[0].value, str)
            and "decimal" in sub.args[0].value.lower()
        ):
            return True
    return False


#: F functions that always return DOUBLE — a product over one of these is
#: in the precision regime, not the silent-int64-wrap class
_DOUBLE_FUNCS = {"ln", "log", "log2", "log10", "sqrt", "exp", "avg", "rand"}


def _is_float_literal_mult(node: ast.BinOp) -> bool:
    """Products with a visibly-double operand run in double — a different
    (precision) regime, not the silent-int64-wrap class this scan hunts."""
    for side in (node.left, node.right):
        if isinstance(side, ast.Constant) and isinstance(side.value, float):
            return True
        for sub in ast.walk(side):
            if isinstance(sub, ast.Call) and isinstance(
                sub.func, ast.Attribute
            ):
                if sub.func.attr in _DOUBLE_FUNCS:
                    return True
                if sub.func.attr == "cast" and sub.args and isinstance(
                    sub.args[0], ast.Constant
                ):
                    t = str(sub.args[0].value).lower()
                    if "double" in t or "float" in t:
                        return True
                if sub.func.attr == "lit" and sub.args and isinstance(
                    sub.args[0], ast.Constant
                ) and isinstance(sub.args[0].value, float):
                    return True
    return False


def scan_spark_sources() -> list[str]:
    """Flag ``F.sum(...)`` aggregates whose argument multiplies columns
    without lifting the product into DECIMAL — the silent-BIGINT-wrap
    hazard class (ADVICE r8: stratified_ate, acf_profile). Waive a
    genuinely bounded product with an ``# int-ok: <reason>`` comment on
    the product's source line."""
    hits: list[str] = []
    for path in sorted(glob.glob(f"{_PKG_DIR}/**/*.py", recursive=True)):
        src = open(path).read()
        lines = src.splitlines()
        tree = ast.parse(src)
        rel = os.path.relpath(path, os.path.dirname(_PKG_DIR))
        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "sum"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
                and node.args
            ):
                continue
            arg = node.args[0]
            if _has_decimal_cast(arg):
                continue  # the sum rides the exact-decimal path
            for sub in ast.walk(arg):
                if not (
                    isinstance(sub, ast.BinOp)
                    and isinstance(sub.op, ast.Mult)
                ):
                    continue
                if _is_float_literal_mult(sub):
                    continue
                # waiver window: the product's line or the two lines above
                # (the comment convention puts the reason right above the
                # expression it waives)
                lo = max(0, sub.lineno - 3)
                if any("int-ok:" in ln for ln in lines[lo:sub.lineno]):
                    continue
                hits.append(
                    f"{rel}:{sub.lineno}: unguarded product inside "
                    f"F.sum(): {lines[sub.lineno - 1].strip()[:80]}"
                )
    return hits


def _root_name(node: ast.AST) -> str | None:
    """Root Name of a method chain: ``a.groupBy(k).agg(x)`` -> ``a``."""
    cur = node
    while True:
        if isinstance(cur, ast.Name):
            return cur.id
        if isinstance(cur, ast.Call):
            cur = cur.func
        elif isinstance(cur, ast.Attribute):
            cur = cur.value
        else:
            return None


def _groups_by_param(node: ast.AST, params: set[str]) -> bool:
    """True if the subtree contains ``.groupBy(<param>)`` / ``.partitionBy
    (<param>)`` over one of the named function parameters."""
    for sub in ast.walk(node):
        if (
            isinstance(sub, ast.Call)
            and isinstance(sub.func, ast.Attribute)
            and sub.func.attr in ("groupBy", "partitionBy")
            and any(
                isinstance(a, ast.Name) and a.id in params for a in sub.args
            )
        ):
            return True
    return False


def scan_broadcast_per_key() -> list[str]:
    """Flag ``F.broadcast(X)`` where X derives from ``groupBy(key_col)``
    over a USER-SUPPLIED per-entity key parameter — the r9/r10 ADVICE
    class (ljung_box, classical_decomposition, seasonal_strength,
    pettitt_changepoint): a per-key table grows with key cardinality, so
    the hint exceeds the broadcast threshold / driver memory exactly when
    the data gets big. Scope: function parameters literally named
    ``key_col`` (the per-entity key convention in operators/); bounded
    group columns (label, event_type buckets) use other parameter names
    and legitimately broadcast. Waive a genuinely bounded case with a
    ``# bounded-broadcast: <reason>`` comment within 3 lines above."""
    hits: list[str] = []
    for path in sorted(glob.glob(f"{_PKG_DIR}/**/*.py", recursive=True)):
        src = open(path).read()
        if "F.broadcast" not in src:
            continue
        rel = os.path.relpath(path, os.path.dirname(_PKG_DIR))
        hits.extend(scan_broadcast_src(src, rel))
    return hits


def scan_broadcast_src(src: str, rel: str) -> list[str]:
    """Per-source worker for :func:`scan_broadcast_per_key` (separate so
    the gate test can feed it a known-bad snippet and prove the detector
    actually fires)."""
    hits: list[str] = []
    lines = src.splitlines()
    for fn in ast.walk(ast.parse(src)):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        params = {
            a.arg
            for a in fn.args.args + fn.args.kwonlyargs
            if a.arg == "key_col"
        }
        if not params:
            continue
        # transitive closure: names assigned from a groupBy(key_col)
        # chain, or from a chain rooted at an already-tainted name
        tainted: set[str] = set()
        changed = True
        while changed:
            changed = False
            for st in ast.walk(fn):
                if not (
                    isinstance(st, ast.Assign)
                    and len(st.targets) == 1
                    and isinstance(st.targets[0], ast.Name)
                ):
                    continue
                tgt = st.targets[0].id
                if tgt in tainted:
                    continue
                if _groups_by_param(st.value, params) or (
                    _root_name(st.value) in tainted
                ):
                    tainted.add(tgt)
                    changed = True
        for sub in ast.walk(fn):
            if not (
                isinstance(sub, ast.Call)
                and isinstance(sub.func, ast.Attribute)
                and sub.func.attr == "broadcast"
                and isinstance(sub.func.value, ast.Name)
                and sub.func.value.id == "F"
                and sub.args
            ):
                continue
            arg = sub.args[0]
            bad = _groups_by_param(arg, params) or (
                _root_name(arg) in tainted
            )
            if not bad:
                continue
            lo = max(0, sub.lineno - 4)
            if any(
                "bounded-broadcast:" in ln for ln in lines[lo:sub.lineno]
            ):
                continue
            hits.append(
                f"{rel}:{sub.lineno}: F.broadcast of a per-key_col "
                f"table in {fn.name}(): "
                f"{lines[sub.lineno - 1].strip()[:70]}"
            )
    return hits


def main() -> int:
    if "--scan-broadcast" in sys.argv:
        hits = scan_broadcast_per_key()
        for h in hits:
            print(f"  {h}")
        print(f"\n{len(hits)} per-key broadcasts" if hits else "\nSCAN CLEAN")
        return 1 if hits else 0
    if "--scan-source" in sys.argv:
        hits = scan_spark_sources()
        for h in hits:
            print(f"  {h}")
        print(
            f"\n{len(hits)} unguarded products" if hits else "\nSCAN CLEAN"
        )
        return 1 if hits else 0

    import duckdb

    import __spark_entry__ as entrymod
    from feature_store_fraud_detection_spark.schemas import TESTDATA_TABLES
    from feature_store_fraud_detection_spark.session import get_spark

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
