"""Property sweep: market-basket pair support/lift vs a brute-force
pure-Python twin on arbitrary small order/item tables — round 11's
sweep of the last unswept families (VERDICT r10 task 4). Exercises
duplicate (order, item) rows, the max_basket cap, min_support
filtering, and the exact integer-count lift arithmetic.
"""

from __future__ import annotations

import math
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_rows_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 6)),  # (order, item)
    min_size=0,
    max_size=40,
)


def _round4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


def _brute(rows, min_support, max_basket):
    baskets: dict[int, set[int]] = {}
    for o, i in set(rows):
        baskets.setdefault(o, set()).add(i)
    capped = {o: sorted(s) for o, s in baskets.items() if len(s) <= max_basket}
    n_orders = len(capped)
    n_item: dict[int, int] = {}
    pair_n: dict[tuple[int, int], int] = {}
    for items in capped.values():
        for i in items:
            n_item[i] = n_item.get(i, 0) + 1
        for a, b in combinations(items, 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    return {
        (a, b): (
            n_ab,
            _round4((n_ab * n_orders) / (n_item[a] * n_item[b])),
        )
        for (a, b), n_ab in pair_n.items()
        if n_ab >= min_support
    }


@SET
@given(_rows_strategy, st.integers(1, 3), st.integers(2, 4))
def test_basket_pairs_match_bruteforce(spark, rows, min_support, max_basket):
    from feature_store_fraud_detection_spark.operators.market_basket import (
        basket_pairs,
    )

    df = spark.createDataFrame(
        [(o, i) for o, i in rows] or [(None, None)],
        "o long, i long",
    )
    if not rows:
        df = df.filter("o IS NOT NULL")
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.lift)
        for r in basket_pairs(
            df, "o", "i", min_support=min_support, max_basket=max_basket
        ).collect()
    }
    assert got == _brute(rows, min_support, max_basket)


@SET
@given(_rows_strategy)
def test_basket_pairs_lift_symmetric_in_duplicates(spark, rows):
    """Duplicating every input row must not change anything — support is
    over DISTINCT (order, item) pairs."""
    from feature_store_fraud_detection_spark.operators.market_basket import (
        basket_pairs,
    )

    base = [(o, i) for o, i in rows] or [(0, 0)]
    df1 = spark.createDataFrame(base, "o long, i long")
    df2 = spark.createDataFrame(base + base, "o long, i long")
    out1 = sorted(map(tuple, basket_pairs(df1, "o", "i").collect()))
    out2 = sorted(map(tuple, basket_pairs(df2, "o", "i").collect()))
    assert out1 == out2
