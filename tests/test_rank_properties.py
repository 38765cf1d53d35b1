"""Property-based checks of the round-9 rank/concordance family: for
arbitrary small integer datasets, the exact-integer Spark surfaces
(doubled average ranks, tie terms, pair counts) must equal brute-force
pure-Python recomputations of the textbook formulas."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _avg_ranks(values):
    """value -> average rank (1-based, ties share the mean rank)."""
    s = sorted(values)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


SET = settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=4,
        max_size=24,
    )
)
def test_kruskal_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.stats import (
        kruskal_wallis,
    )

    groups = {g for g, _ in rows}
    if len(groups) < 2:
        rows = rows + [(0, 0), (1, 1)]
    df = spark.createDataFrame(
        [(str(g), v) for g, v in rows], "g string, v long"
    )
    out = {r.g: r for r in kruskal_wallis(df, "g", "v").collect()}

    vals = [v for _, v in rows]
    ranks = _avg_ranks(vals)
    n = len(vals)
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(str(g), []).append(v)
    h = 12.0 / (n * (n + 1)) * sum(
        (sum(ranks[v] for v in vs)) ** 2 / len(vs)
        for vs in by_g.values()
    ) - 3.0 * (n + 1)
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(vals).values())
    any_row = next(iter(out.values()))
    assert any_row.n_total == n and any_row.tie_term == tie
    assert abs(any_row.h_stat - h) < 1e-3
    for g, vs in by_g.items():
        assert out[g].rank_sum_x2 == round(2 * sum(ranks[v] for v in vs))
    corr = 1.0 - tie / (n**3 - n)
    if corr > 0:
        assert abs(any_row.h_tie_corrected - h / corr) < 1e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-4, max_value=4),
            st.integers(min_value=-4, max_value=4),
        ),
        min_size=3,
        max_size=24,
    )
)
def test_spearman_matches_bruteforce(spark, pairs):
    from feature_store_fraud_detection_spark.operators.stats import (
        spearman_rho,
    )

    df = spark.createDataFrame(pairs, "x long, y long")
    r = spearman_rho(df, "x", "y").collect()[0]
    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]
    rx = _avg_ranks(xs)
    ry = _avg_ranks(ys)
    a = [rx[x] for x in xs]
    b = [ry[y] for y in ys]
    n = len(pairs)
    ma, mb = sum(a) / n, sum(b) / n
    cov = sum((u - ma) * (v - mb) for u, v in zip(a, b))
    va = sum((u - ma) ** 2 for u in a)
    vb = sum((v - mb) ** 2 for v in b)
    assert r.n == n
    if va > 0 and vb > 0:
        assert abs(r.spearman_rho - cov / math.sqrt(va * vb)) < 1e-3
    else:
        assert r.spearman_rho is None


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=2,
        max_size=24,
    )
)
def test_kendall_tau_b_matches_bruteforce(spark, pairs):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        kendall_tau_b,
    )

    df = spark.createDataFrame(pairs, "x long, y long")
    r = kendall_tau_b(df, "x", "y").collect()[0]
    conc = disc = tx = ty = 0
    n = len(pairs)
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[i][0] - pairs[j][0]
            dy = pairs[i][1] - pairs[j][1]
            if dx == 0 and dy == 0:
                continue
            if dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                conc += 1
            else:
                disc += 1
    assert (r.conc_pairs, r.disc_pairs) == (conc, disc)
    n0 = n * (n - 1) / 2
    from collections import Counter

    n1 = sum(c * (c - 1) / 2 for c in Counter(x for x, _ in pairs).values())
    n2 = sum(c * (c - 1) / 2 for c in Counter(y for _, y in pairs).values())
    if n0 - n1 > 0 and n0 - n2 > 0:
        tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
        assert abs(r.tau_b - tau) < 1e-3
    else:
        assert r.tau_b is None
    if conc + disc > 0:
        assert abs(r.gamma - (conc - disc) / (conc + disc)) < 1e-3
    else:
        assert r.gamma is None
    if n0 - n1 > 0:
        assert abs(r.somers_dyx - (conc - disc) / (n0 - n1)) < 1e-3
    else:
        assert r.somers_dyx is None


@SET
@given(
    st.lists(st.integers(min_value=-6, max_value=6), min_size=1, max_size=24)
)
def test_wilcoxon_matches_bruteforce(spark, diffs):
    import pytest

    from feature_store_fraud_detection_spark.operators.stats import (
        wilcoxon_signed_rank,
    )

    df = spark.createDataFrame([(d,) for d in diffs], "d long")
    nz = [d for d in diffs if d != 0]
    if not nz:
        with pytest.raises(Exception, match="wilcoxon_signed_rank"):
            wilcoxon_signed_rank(df, "d").collect()
        return
    r = wilcoxon_signed_rank(df, "d").collect()[0]
    ranks = _avg_ranks([abs(d) for d in nz])
    w_plus = sum(ranks[abs(d)] for d in nz if d > 0)
    n = len(nz)
    from collections import Counter

    tie = sum(
        c**3 - c for c in Counter(abs(d) for d in nz).values()
    )
    assert r.n_nonzero == n and r.n_zero == len(diffs) - n
    assert r.w_plus_x2 == round(2 * w_plus)
    assert r.tie_term == tie
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
    if var > 0:
        z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
        assert abs(r.z_score - z) < 1e-3
    else:
        assert r.z_score is None


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=24,
    )
)
def test_average_precision_matches_bruteforce(spark, rows):
    import pytest

    from feature_store_fraud_detection_spark.operators.evaluation import (
        average_precision,
    )

    df = spark.createDataFrame(rows, "s long, y int")
    n_pos = sum(y for _, y in rows)
    if n_pos == 0:
        with pytest.raises(Exception, match="average_precision"):
            average_precision(df, "s", "y").collect()
        return
    r = average_precision(df, "s", "y").collect()[0]
    # sklearn step convention over distinct thresholds descending
    thresholds = sorted({s for s, _ in rows}, reverse=True)
    ap = 0.0
    prev_tp = 0
    for t in thresholds:
        tp = sum(1 for s, y in rows if s >= t and y == 1)
        fp = sum(1 for s, y in rows if s >= t and y != 1)
        ap += (tp - prev_tp) / n_pos * (tp / (tp + fp))
        prev_tp = tp
    assert r.n_pos == n_pos
    assert abs(r.ap - ap) < 1e-3
