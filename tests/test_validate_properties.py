"""Property sweep: the data-quality rule engine and cross-table checks
(validate rules, referential violations, order-total reconciliation) vs
brute-force pure-Python twins — round 11. The privacy half of
validate.py (k-anonymity, l-diversity, t-closeness, DP counts) already
has its own sweep in test_privacy_properties.py; this covers the rest.
"""

from __future__ import annotations

import math
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 20)),  # v (nullable)
        st.sampled_from(["a", "b", "zz", "q"]),  # s
    ),
    min_size=1,
    max_size=25,
)


@SET
@given(_rows)
def test_validate_rules_match_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.validate import (
        in_range,
        matches,
        not_null,
        one_of,
        validate,
    )

    df = spark.createDataFrame(rows, "v long, s string")
    rules = [
        not_null("v"),
        in_range("v", 0, 10),
        one_of("s", ["a", "b"]),
        matches("s", "^[ab]$"),
    ]
    got = {
        r.rule: (r.n_violations, r.violation_rate)
        for r in validate(df, rules).collect()
    }
    n = len(rows)

    def report(viol):
        return (viol, _round4(viol / n))

    # NULL predicate results count as violations (unknown fails the gate)
    expect = {
        "v_not_null": report(sum(1 for v, _ in rows if v is None)),
        "v_in_range": report(
            sum(1 for v, _ in rows if v is None or not (0 <= v <= 10))
        ),
        "s_one_of": report(sum(1 for _, s in rows if s not in ("a", "b"))),
        "s_matches": report(sum(1 for _, s in rows if s not in ("a", "b"))),
    }
    assert got == expect


@SET
@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 8)),
             min_size=0, max_size=20),
    st.lists(st.integers(0, 8), min_size=0, max_size=6),
)
def test_referential_violations_match_bruteforce(spark, child_rows, parents):
    from feature_store_fraud_detection_spark.operators.validate import (
        referential_violations,
    )

    child = spark.createDataFrame(
        child_rows or [(0, 0)], "rid long, fk long"
    )
    if not child_rows:
        child = child.filter("rid < 0")
    parent = spark.createDataFrame(
        [(p,) for p in parents] or [(0,)], "pk long"
    )
    if not parents:
        parent = parent.filter("pk < 0")
    got = sorted(
        (r.rid, r.fk)
        for r in referential_violations(child, parent, "fk", "pk").collect()
    )
    assert got == sorted(
        (rid, fk) for rid, fk in child_rows if fk not in set(parents)
    )


@SET
@given(
    st.lists(  # one order per entry: (status, stored_cents_offset)
        st.tuples(st.sampled_from(["O", "F"]), st.integers(-3, 3)),
        min_size=1,
        max_size=8,
    ),
    st.lists(  # line items: (orderkey_idx, price_cents, disc_pct, tax_pct)
        st.tuples(st.integers(0, 7), st.integers(100, 99999),
                  st.integers(0, 10), st.integers(0, 8)),
        min_size=0,
        max_size=20,
    ),
)
def test_reconcile_order_totals_matches_bruteforce(spark, orders, lines):
    from feature_store_fraud_detection_spark.operators.validate import (
        reconcile_order_totals,
    )

    lines = [(ok, p, d, t) for ok, p, d, t in lines if ok < len(orders)]
    # exact per-order totals in Decimal (mirrors the operator's DECIMAL
    # path), stored total = recomputed + offset cents
    recomputed = {}
    for ok, p, d, t in lines:
        charge = (
            Decimal(p) / 100
            * (1 - Decimal(d) / 100)
            * (1 + Decimal(t) / 100)
        )
        recomputed[ok] = recomputed.get(ok, Decimal(0)) + charge
    odf = spark.createDataFrame(
        [
            (i, status, float(recomputed.get(i, Decimal(0))) + off / 100.0)
            for i, (status, off) in enumerate(orders)
        ],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    ldf = spark.createDataFrame(
        [
            (ok, p / 100.0, d / 100.0, t / 100.0)
            for ok, p, d, t in lines
        ]
        or [(0, 0.0, 0.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )
    if not lines:
        ldf = ldf.filter("l_orderkey < 0")
    tol = 0.01
    got = {
        r.o_orderstatus: (r.n_orders, r.n_no_lines, r.n_mismatched,
                          r.max_abs_diff)
        for r in reconcile_order_totals(odf, ldf, tolerance=tol).collect()
    }
    per_status: dict[str, list[float]] = {}
    for i, (status, off) in enumerate(orders):
        if i in recomputed:
            stored = float(recomputed[i]) + off / 100.0
            diff = _round4(abs(float(recomputed[i]) - stored))
        else:
            diff = -1.0
        per_status.setdefault(status, []).append(diff)
    expect = {
        s: (
            len(ds),
            sum(1 for d in ds if d < 0),
            sum(1 for d in ds if d >= 0 and d > tol),
            _round4(max(ds)),
        )
        for s, ds in per_status.items()
    }
    assert got == expect
