"""Degenerate-input robustness probe: run EVERY registry query against
pathological dataset shapes and classify the failures.

Motivation (round 10): the property-sweep program keeps finding the
same bug class — an ANSI divide-by-zero (or NULL-propagating aggregate)
fired by a degenerate denominator the full-size testdata never
exercises (zero variance, empty cohort, single-frequency spectrum,
all-censored panel). Sweeps find them one operator at a time; this
probe points the whole registry at degenerate shapes at once.

Shapes (round 11 added the asymmetric ones — VERDICT r10 task 5: the
uniform K-row slice can't produce an empty side of a two-input
operator, a single-distinct key, or an all-NULL optional column):

- K-row slice       (default; ``degenerate_probe.py 1`` / ``3``)
- empty:TABLE       every table gets 3 rows except TABLE, which keeps
                    its schema but zero rows — the "empty on exactly
                    one side" case for every asof/interval/linkage/
                    decontaminate/diff-shaped operator
- const             every table is ONE row duplicated 3x: every key
                    column single-valued, every join all-matching,
                    every variance zero
- nulls             3 rows with every OPTIONAL column NULL (keeps id /
                    key / timestamp columns and the embedding vector —
                    those are structural; text, labels, values, props
                    all go NULL)
- nullvec           embeddings.embedding all NULL (the vector analogue
                    of nulls — ANN paths must drop, not crash)
- emptyvec          embeddings.embedding all zero-length arrays — the
                    zero-NORM case (cosine undefined; found 9 ANSI
                    DIVIDE_BY_ZERO aborts in round 11)
- asym              runs every empty:TABLE variant plus const, nulls,
                    nullvec and emptyvec in sequence (the round-11
                    gate)

Round 12 added the extreme-input shapes (VERDICT r11 tasks 2 and 6):

- bigvals           money/measure columns pushed to ~9e12 (~1e10x the
                    documented events.value contract) — DECIMAL-cast
                    sums and int-quantization edges must fail LOUD with
                    the operator name, never a bare ANSI
                    NUMERIC_VALUE_OUT_OF_RANGE / CAST_OVERFLOW
- tinytext          every document is a single character (shorter than
                    any shingle/k-gram/BPE window)
- bigtext           every document is ~1 MB (per-row explosion paths
                    must stay bounded)
- nullts            every TIMESTAMP column all-NULL (the complement of
                    nulls, which keeps timestamps structural)
- extremes          bigvals + tinytext + bigtext + nullts in sequence
                    (the round-12 gate)

Classification per query (ADVICE r11: by the operator-name allowlist
ONLY — exception type is not a signal, because an accidental driver-side
ValueError from float()/int() parsing or a library assertion is a bug,
not a fail-loud; the repo's convention prefixes every deliberate message
with the operator/query name):

- OK            — ran and returned (possibly zero rows)
- NAMED-FAIL    — a deliberate fail-loud: any exception whose message
                  carries a "<known operator/query name>:" prefix where
                  the name comes from the registry + package function
                  inventory (driver-side ValueError/AssertionError and
                  in-plan F.raise_error payloads all follow this form).
                  Message heads are printed so misclassification stays
                  auditable.
- UNNAMED-FAIL  — any other error (DIVIDE_BY_ZERO, cast overflow,
                  getbit range, bare ValueError, ...) with no recognized
                  name: the bug class this tool exists to catch. Exit
                  code 1 if any.

Usage: python tools/degenerate_probe.py [rows_per_table] [query ...]
       python tools/degenerate_probe.py --mode empty:events [query ...]
       python tools/degenerate_probe.py --mode asym
"""

from __future__ import annotations

import ast
import glob as globlib
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

#: tables worth an empty-one-side variant (the dims region/nation are
#: never the "other side" of a two-input operator in the registry)
EMPTY_VARIANT_TABLES = [
    "events", "documents", "embeddings", "orders", "lineitem",
    "customer", "supplier", "part",
]

_PKG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "feature_store_fraud_detection_spark",
)


def _known_names() -> set[str]:
    """Operator/query-name allowlist for fail-loud classification: every
    registry query name plus every top-level function name in the
    package (fail-loud messages use one of these as their prefix)."""
    names: set[str] = set()
    for path in globlib.glob(f"{_PKG_DIR}/**/*.py", recursive=True):
        try:
            tree = ast.parse(open(path).read())
        except SyntaxError:
            continue
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                names.add(node.name.lstrip("_"))
    from feature_store_fraud_detection_spark.plans.registry import QUERIES

    names |= set(QUERIES)
    return {n for n in names if len(n) >= 3}


def _named_matcher() -> re.Pattern[str]:
    alts = "|".join(sorted(map(re.escape, _known_names()), key=len,
                           reverse=True))
    return re.compile(rf"\b(?:{alts})\s*:")


def is_named_failure(
    exc: Exception, msg: str, matcher: re.Pattern[str]
) -> bool:
    """Deliberate fail-loud? The repo's fail-loud convention prefixes
    messages with the operator/query name, so ALL paths — including
    driver-side ValueError/AssertionError — must match the name
    allowlist (round-11 advice: a bare ValueError from an accidental
    float()/int() parse or a library assertion is a BUG, not a named
    fail-loud, and must surface as UNNAMED). In-plan fail-louds go
    through F.raise_error -> USER_RAISED_EXCEPTION, whose payload also
    carries the name prefix. Exception type no longer matters: named
    prefix or bust."""
    del exc  # type is no longer a classification signal
    return bool(matcher.search(msg))


# -- slice builders ----------------------------------------------------------


def build_slice(src_dir: str, out_dir: str, k: int) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{src_dir}/{t}.parquet' LIMIT {k}) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def build_empty_one(src_dir: str, out_dir: str, empty_table: str) -> None:
    """3 rows per table, except ``empty_table``: schema, zero rows."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        lim = 0 if t == empty_table else 3
        duckdb.sql(
            f"COPY (SELECT * FROM '{src_dir}/{t}.parquet' LIMIT {lim}) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def build_const(src_dir: str, out_dir: str) -> None:
    """One row per table, duplicated 3x — single-distinct everything."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT one.* FROM (SELECT * FROM '{src_dir}/{t}.parquet'"
            f" LIMIT 1) one, range(3)) TO '{out_dir}/{t}.parquet'"
            f" (FORMAT PARQUET)"
        )


#: structural columns the nulls variant keeps: keys/ids, event time,
#: and the embedding vector (an all-NULL vector column is a different
#: probe; here we target OPTIONAL payload columns)
def _is_structural(col: str, typ: str) -> bool:
    c = col.lower()
    return (
        "id" in c
        or "key" in c
        or c == "embedding"
        or "TIMESTAMP" in typ.upper()
    )


def build_vec_variant(src_dir: str, out_dir: str, expr: str) -> None:
    """3 rows per table; embeddings.embedding replaced by `expr`."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t == "embeddings":
            duckdb.sql(
                f"COPY (SELECT vec_id, {expr} AS embedding, label FROM "
                f"'{src_dir}/{t}.parquet' LIMIT 3) TO "
                f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            duckdb.sql(
                f"COPY (SELECT * FROM '{src_dir}/{t}.parquet' LIMIT 3) "
                f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
            )


_VEC_EXPRS = {
    "nullvec": "CAST(NULL AS FLOAT[])",
    "emptyvec": "CAST([] AS FLOAT[])",
}


#: money/measure columns for the bigvals variant: every DOUBLE payload a
#: pipeline would sum/avg/quantize. 9e12 is ~1e10x the documented
#: events.value contract (~1e3) — sums of it overflow DECIMAL casts and
#: int-quantization edges unless those are guarded by NAMED fail-louds.
_MONEY_COLS = {
    "events": ["value"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
}


def build_bigvals(src_dir: str, out_dir: str) -> None:
    """3 rows per table; money columns pushed to ~9e12 (keeping a small
    per-row spread so single-distinct collapse doesn't mask the
    overflow path)."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        cols = duckdb.sql(
            f"DESCRIBE SELECT * FROM '{src_dir}/{t}.parquet'"
        ).fetchall()
        big = set(_MONEY_COLS.get(t, []))
        proj = ", ".join(
            f'9.0e12 + abs(coalesce("{c}", 0.0)) AS "{c}"' if c in big
            else f'"{c}"'
            for c, _typ, *_ in cols
        )
        duckdb.sql(
            f"COPY (SELECT {proj} FROM '{src_dir}/{t}.parquet' LIMIT 3) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


#: documents.text replacements for the text-extremes variants. n_chars
#: is recomputed to stay consistent with the new text (operators may
#: trust it as a precomputed length).
_TEXT_EXPRS = {
    # single-character documents: shingling/k-grams/BPE all see a text
    # shorter than their window
    "tinytext": "substr(coalesce(text, 'x'), 1, 1)",
    # ~1 MB documents: per-row explosion paths (char n-grams, token
    # pairs) must stay bounded, not O(len^2)
    "bigtext": "repeat(substr(coalesce(text, 'abcdefgh'), 1, 1024), 1024)",
}


def build_text_variant(src_dir: str, out_dir: str, expr: str) -> None:
    """3 rows per table; documents.text replaced by `expr`, n_chars
    recomputed."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t == "documents":
            duckdb.sql(
                f"COPY (SELECT doc_id, {expr} AS text, lang, source, "
                f"length({expr}) AS n_chars FROM "
                f"'{src_dir}/{t}.parquet' LIMIT 3) TO "
                f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            duckdb.sql(
                f"COPY (SELECT * FROM '{src_dir}/{t}.parquet' LIMIT 3) "
                f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
            )


def build_nullts(src_dir: str, out_dir: str) -> None:
    """3 rows per table; every TIMESTAMP column all-NULL, everything
    else intact (the complement of build_nulls, which keeps timestamps
    structural)."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        cols = duckdb.sql(
            f"DESCRIBE SELECT * FROM '{src_dir}/{t}.parquet'"
        ).fetchall()
        proj = ", ".join(
            f'CAST(NULL AS {typ}) AS "{c}"' if "TIMESTAMP" in typ.upper()
            else f'"{c}"'
            for c, typ, *_ in cols
        )
        duckdb.sql(
            f"COPY (SELECT {proj} FROM '{src_dir}/{t}.parquet' LIMIT 3) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def build_nulls(src_dir: str, out_dir: str) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        cols = duckdb.sql(
            f"DESCRIBE SELECT * FROM '{src_dir}/{t}.parquet'"
        ).fetchall()
        proj = ", ".join(
            f'"{c}"' if _is_structural(c, typ)
            else f'CAST(NULL AS {typ}) AS "{c}"'
            for c, typ, *_ in cols
        )
        duckdb.sql(
            f"COPY (SELECT {proj} FROM '{src_dir}/{t}.parquet' LIMIT 3) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


# -- runner ------------------------------------------------------------------


def run_variant(spark, matcher, label: str, data_dir: str,
                only: set[str]) -> list[str]:
    """Run the registry against one slice; print and return UNNAMED."""
    from feature_store_fraud_detection_spark.plans.registry import QUERIES

    results: dict[str, list[str]] = {"OK": [], "NAMED-FAIL": [],
                                     "UNNAMED-FAIL": []}
    named_heads: dict[str, str] = {}
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            spec.fn(spark, data_dir).limit(5000).collect()
            results["OK"].append(name)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc)
            if is_named_failure(exc, msg, matcher):
                results["NAMED-FAIL"].append(name)
                named_heads[name] = (
                    msg.strip().splitlines()[0][:160] if msg else ""
                )
            else:
                results["UNNAMED-FAIL"].append(name)
                head = msg.strip().splitlines()[0][:160] if msg else (
                    traceback.format_exc().strip().splitlines()[-1][:160]
                )
                print(f"  UNNAMED [{label}] {name}: {head}", flush=True)
        spark.catalog.clearCache()
    print(f"[{label}]  OK={len(results['OK'])}  "
          f"named-fail={len(results['NAMED-FAIL'])}  "
          f"UNNAMED-fail={len(results['UNNAMED-FAIL'])}", flush=True)
    if results["NAMED-FAIL"]:
        print(f"[{label}] named fail-louds (acceptable; heads printed "
              "for audit):")
        for n in results["NAMED-FAIL"]:
            print(f"    {n}: {named_heads.get(n, '')}")
    return results["UNNAMED-FAIL"]


def main() -> int:
    args = sys.argv[1:]
    mode = "k"
    k = 1
    if args and args[0] == "--mode":
        mode = args[1]
        args = args[2:]
    elif args and args[0].isdigit():
        k = int(args[0])
        args = args[1:]
    only = set(args)

    from feature_store_fraud_detection_spark.session import get_spark

    src = "/root/testdata/sf0.001"
    tmp = tempfile.gettempdir()
    matcher = _named_matcher()
    spark = get_spark(app_name="degenerate-probe")
    spark.sparkContext.setLogLevel("FATAL")

    variants: list[tuple[str, str]] = []
    if mode == "k":
        out = os.path.join(tmp, f"degenerate_sf_k{k}")
        build_slice(src, out, k)
        variants.append((f"k{k}", out))
    elif mode.startswith("empty:"):
        t = mode.split(":", 1)[1]
        out = os.path.join(tmp, f"degenerate_sf_empty_{t}")
        build_empty_one(src, out, t)
        variants.append((mode, out))
    elif mode == "const":
        out = os.path.join(tmp, "degenerate_sf_const")
        build_const(src, out)
        variants.append((mode, out))
    elif mode == "nulls":
        out = os.path.join(tmp, "degenerate_sf_nulls")
        build_nulls(src, out)
        variants.append((mode, out))
    elif mode in _VEC_EXPRS:
        out = os.path.join(tmp, f"degenerate_sf_{mode}")
        build_vec_variant(src, out, _VEC_EXPRS[mode])
        variants.append((mode, out))
    elif mode == "bigvals":
        out = os.path.join(tmp, "degenerate_sf_bigvals")
        build_bigvals(src, out)
        variants.append((mode, out))
    elif mode in _TEXT_EXPRS:
        out = os.path.join(tmp, f"degenerate_sf_{mode}")
        build_text_variant(src, out, _TEXT_EXPRS[mode])
        variants.append((mode, out))
    elif mode == "nullts":
        out = os.path.join(tmp, "degenerate_sf_nullts")
        build_nullts(src, out)
        variants.append((mode, out))
    elif mode == "extremes":
        # round-12 sweep: extreme-value + text-extreme + null-timestamp
        out = os.path.join(tmp, "degenerate_sf_bigvals")
        build_bigvals(src, out)
        variants.append(("bigvals", out))
        for tm, expr in _TEXT_EXPRS.items():
            out = os.path.join(tmp, f"degenerate_sf_{tm}")
            build_text_variant(src, out, expr)
            variants.append((tm, out))
        out = os.path.join(tmp, "degenerate_sf_nullts")
        build_nullts(src, out)
        variants.append(("nullts", out))
    elif mode == "asym":
        for t in EMPTY_VARIANT_TABLES:
            out = os.path.join(tmp, f"degenerate_sf_empty_{t}")
            build_empty_one(src, out, t)
            variants.append((f"empty:{t}", out))
        out = os.path.join(tmp, "degenerate_sf_const")
        build_const(src, out)
        variants.append(("const", out))
        out = os.path.join(tmp, "degenerate_sf_nulls")
        build_nulls(src, out)
        variants.append(("nulls", out))
        for vm, expr in _VEC_EXPRS.items():
            out = os.path.join(tmp, f"degenerate_sf_{vm}")
            build_vec_variant(src, out, expr)
            variants.append((vm, out))
    else:
        print(f"unknown mode {mode!r}", file=sys.stderr)
        return 2

    unnamed: list[str] = []
    for label, data_dir in variants:
        unnamed += [
            f"[{label}] {n}"
            for n in run_variant(spark, matcher, label, data_dir, only)
        ]
    if unnamed:
        print(f"\nUNNAMED failures across variants (fix these): "
              f"{len(unnamed)}")
        for n in unnamed:
            print(f"    {n}")
        return 1
    print("\nALL VARIANTS CLEAN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
