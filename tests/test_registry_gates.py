"""Registry-integrity gates (no Spark session needed).

VERDICT r8 task 5: at 262 queries, dict-based registration makes a name
collision silent — a later ``QUERIES.update({...})`` with a reused key
REPLACES the earlier query and its oracle, and the grading window keeps
reporting green against the wrong semantics (the round-8 near-miss: an
in-session ``cohort_retention`` twin almost shadowed the r3 oracle).
These gates make both failure modes loud:

1. every query name is registered exactly ONCE across the whole
   registry construction (AST scan of every dict literal passed to
   ``QUERIES.update`` plus the seed dict);
2. every registered name is cited in COVERAGE.md (so an undocumented
   query can't silently join the driver's grading surface);
3. the _GRADING_PRIORITY reorder list references only real queries and
   itself contains no duplicates;
4. the static overflow scan (tools/check_types.py --scan-source) is
   clean — unguarded BIGINT products inside F.sum() are the r6
   red-row hazard class (silent int64 wrap in non-ANSI Spark while the
   DuckDB twin widens to HUGEINT).
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

REGISTRY_PATH = os.path.join(
    REPO, "feature_store_fraud_detection_spark", "plans", "registry.py"
)


def _registered_names() -> list[str]:
    """Every string key of every dict literal that feeds QUERIES —
    the seed ``QUERIES = {...}`` / reorder dict comprehensions are
    name-only, so collisions can only enter through dict literals."""
    tree = ast.parse(open(REGISTRY_PATH).read())
    names: list[str] = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        keys = [
            k.value
            for k in node.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        ]
        # a QUERIES dict literal maps name -> QuerySpec(...) call
        specish = [
            v
            for v in node.values
            if isinstance(v, ast.Call)
            and getattr(v.func, "id", getattr(v.func, "attr", ""))
            == "QuerySpec"
        ]
        if specish and len(specish) == len(node.values):
            names.extend(keys)
    return names


def test_no_duplicate_registry_names():
    names = _registered_names()
    assert len(names) > 200, (
        f"AST scan found only {len(names)} QuerySpec dict keys — the "
        "registration idiom changed; update _registered_names()"
    )
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, (
        f"duplicate registry names (a later QUERIES.update silently "
        f"replaces the earlier query AND its oracle): {dupes}"
    )


def test_registered_names_match_runtime_registry():
    from feature_store_fraud_detection_spark.plans.registry import QUERIES

    names = set(_registered_names())
    runtime = set(QUERIES)
    assert names == runtime, (
        f"AST-visible names != runtime registry; only-in-ast="
        f"{sorted(names - runtime)} only-in-runtime={sorted(runtime - names)}"
    )


def test_every_query_cited_in_coverage_md():
    from feature_store_fraud_detection_spark.plans.registry import QUERIES

    md = open(os.path.join(REPO, "COVERAGE.md")).read()
    uncited = sorted(n for n in QUERIES if f"`{n}`" not in md)
    assert not uncited, (
        f"queries not cited in COVERAGE.md (add a row to the registry "
        f"cross-index): {uncited}"
    )


def test_grading_priority_is_valid():
    import feature_store_fraud_detection_spark.plans.registry as reg

    prio = reg._GRADING_PRIORITY
    assert len(prio) == len(set(prio)), "duplicate names in _GRADING_PRIORITY"
    unknown = sorted(set(prio) - set(reg.QUERIES))
    assert not unknown, f"_GRADING_PRIORITY names not in registry: {unknown}"
    assert len(prio) <= 50, (
        "_GRADING_PRIORITY longer than the 50-query driver window — the "
        "overflow would silently never be graded this round"
    )


def test_overflow_scan_clean():
    from check_types import scan_spark_sources

    hits = scan_spark_sources()
    assert not hits, (
        "unguarded BIGINT products inside F.sum() — lift into "
        "DECIMAL(38,0) or waive with an '# int-ok: <reason>' comment:\n"
        + "\n".join(hits)
    )


_BAD_BROADCAST_SNIPPET = '''
def seasonal(df, key_col, val_col):
    per_key = df.groupBy(key_col).agg(F.sum(val_col).alias("s"))
    narrowed = per_key.select(key_col, "s")
    return df.join(F.broadcast(narrowed), key_col)
'''

_WAIVED_BROADCAST_SNIPPET = '''
def seasonal(df, key_col, val_col):
    per_key = df.groupBy(key_col).agg(F.sum(val_col).alias("s"))
    # bounded-broadcast: key_col is contractually <= 8 distinct here
    return df.join(F.broadcast(per_key), key_col)
'''


def test_per_key_broadcast_scan_clean_and_detector_fires():
    """VERDICT r10 task 2: no F.broadcast on a table keyed by a
    user-supplied key column (the seasonal_strength / pettitt class —
    the hint grows with key cardinality). The repo must be clean AND
    the detector must actually fire on the known-bad shape (including
    through one select() hop), else a clean run proves nothing."""
    from check_types import scan_broadcast_per_key, scan_broadcast_src

    assert scan_broadcast_src(_BAD_BROADCAST_SNIPPET, "x.py"), (
        "detector failed to flag the known-bad per-key broadcast shape"
    )
    assert not scan_broadcast_src(_WAIVED_BROADCAST_SNIPPET, "x.py"), (
        "bounded-broadcast waiver comment not honored"
    )
    hits = scan_broadcast_per_key()
    assert not hits, (
        "F.broadcast of a per-key_col table (grows with key cardinality "
        "— drop the hint or waive with '# bounded-broadcast: <reason>'):\n"
        + "\n".join(hits)
    )


def test_core_tier_covers_every_test_module():
    """`pytest -m core` drift gate (round 10): every non-property test
    module must contribute at least one test to the fast tier, and every
    CORE_TESTS name must still exist — so the ~5-min round-close path
    keeps touching every operator family as the suite grows. Property-
    sweep modules are exempt: they cross-check operators whose hand
    fixtures already carry the family coverage."""
    import ast
    import glob

    from conftest import CORE_TESTS

    tests_dir = os.path.join(REPO, "tests")
    all_names: set[str] = set()
    missing_modules = []
    for path in sorted(glob.glob(os.path.join(tests_dir, "test_*.py"))):
        tree = ast.parse(open(path).read())
        names = {
            n.name
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            and n.name.startswith("test_")
        }
        all_names |= names
        if "_properties" in os.path.basename(path):
            continue
        if not names & CORE_TESTS:
            missing_modules.append(os.path.basename(path))
    assert not missing_modules, (
        f"test modules with NO core-tier test (add one representative "
        f"to tests/conftest.py::CORE_TESTS): {missing_modules}"
    )
    stale = sorted(CORE_TESTS - all_names)
    assert not stale, f"CORE_TESTS names that no longer exist: {stale}"
