"""Property-based sweeps for the ESTABLISHED (r7/r8) inference family —
the same brute-force-textbook cross-checking discipline the round-9
operators ship with, extended backward: mann_whitney_u, ks_two_sample,
anova_f, chi2_independence, cohens_kappa, mcnemar_test, cmh_test and
pettitt_changepoint vs pure-Python references on arbitrary small
integer datasets."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)


def _avg_ranks(values):
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


@SET
@given(
    st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=15),
    st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=15),
)
def test_mann_whitney_matches_bruteforce(spark, t, c):
    from feature_store_fraud_detection_spark.operators.stats import (
        mann_whitney_u,
    )

    rows = [(1, v) for v in t] + [(0, v) for v in c]
    df = spark.createDataFrame(rows, "g int, v long")
    r = mann_whitney_u(df, "g", "v", 1).collect()[0]
    pooled = t + c
    ranks = _avg_ranks(pooled)
    r_t = sum(ranks[v] for v in t)
    u = r_t - len(t) * (len(t) + 1) / 2
    assert r.n == len(pooled)
    assert r.rank_sum_x2 == round(2 * r_t)
    assert r.u_x2 == round(2 * u)
    tie = sum(x**3 - x for x in Counter(pooled).values())
    assert r.tie_term == tie
    # common-language effect size
    assert abs(r.effect_cl - u / (len(t) * len(c))) < 1e-3
    n = len(pooled)
    var = (
        len(t) * len(c) / 12.0 * ((n + 1) - tie / (n * (n - 1)))
        if n > 1
        else 0.0
    )
    if var > 0:
        z = (u - len(t) * len(c) / 2.0) / math.sqrt(var)
        assert abs(r.z_score - z) < 1e-3


@SET
@given(
    st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=15),
    st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=15),
)
def test_ks_two_sample_matches_bruteforce(spark, t, c):
    from feature_store_fraud_detection_spark.operators.stats import (
        ks_two_sample,
    )

    rows = [(1, v) for v in t] + [(0, v) for v in c]
    df = spark.createDataFrame(rows, "g int, v long")
    r = ks_two_sample(df, "g", "v", 1).collect()[0]
    vals = sorted(set(t + c))
    d_scaled = max(
        abs(
            sum(1 for x in t if x <= v) * len(c)
            - sum(1 for x in c if x <= v) * len(t)
        )
        for v in vals
    )
    assert (r.n_treat, r.n_control) == (len(t), len(c))
    assert r.d_scaled == d_scaled
    assert abs(r.d_stat - d_scaled / (len(t) * len(c))) < 1e-3


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=12),
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=12),
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=12),
)
def test_anova_f_matches_bruteforce(spark, ga, gb, gc):
    from feature_store_fraud_detection_spark.operators.stats import anova_f

    rows = (
        [("a", v) for v in ga] + [("b", v) for v in gb]
        + [("c", v) for v in gc]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in anova_f(df, "g", "v", scale=1).collect()}
    allv = ga + gb + gc
    gm = sum(allv) / len(allv)
    groups = {"a": ga, "b": gb, "c": gc}
    ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups.values())
    ssw = sum(
        (v - sum(g) / len(g)) ** 2 for g in groups.values() for v in g
    )
    r = out["a"]
    assert r.n_total == len(allv) and r.k == 3
    for name, g in groups.items():
        assert out[name].sum_scaled == sum(g)
    if ssw > 0:
        f = (ssb / 2) / (ssw / (len(allv) - 3))
        assert abs(r.f_stat - f) < max(1e-3, abs(f) * 1e-3)
    else:
        assert r.f_stat is None
    if ssb + ssw > 0:
        assert abs(r.eta2 - ssb / (ssb + ssw)) < 1e-3
    else:
        assert r.eta2 is None


@SET
@given(
    st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), st.booleans()),
        min_size=4,
        max_size=24,
    )
)
def test_chi2_independence_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.stats import (
        chi2_independence,
    )

    df = spark.createDataFrame(rows, "cat string, y boolean")
    out = chi2_independence(df, "cat", "y").collect()
    n = len(rows)
    cats = Counter(c for c, _ in rows)
    labels = Counter(y for _, y in rows)
    cells = Counter(rows)
    for r in out:
        exp = cats[r.cat] * labels[r.label] / n
        assert abs(r.expected - exp) < 1e-3
        obs = cells[(r.cat, r.label)]
        assert r.n == obs
        if exp > 0:
            assert abs(r.chi2_term - (obs - exp) ** 2 / exp) < 1e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]), st.sampled_from(["a", "b", "c"])
        ),
        min_size=1,
        max_size=24,
    )
)
def test_cohens_kappa_matches_bruteforce(spark, pairs):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        cohens_kappa,
    )

    df = spark.createDataFrame(pairs, "ra string, rb string")
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    n = len(pairs)
    po = sum(1 for a, b in pairs if a == b) / n
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    pe = sum(ma[k] * mb.get(k, 0) for k in ma) / (n * n)
    assert abs(r.po - po) < 1e-3 and abs(r.pe - pe) < 1e-3
    if pe < 1.0:
        assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-3
    else:
        assert r.kappa is None


@SET
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans(), st.booleans()),
        min_size=2,
        max_size=24,
    )
)
def test_mcnemar_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        mcnemar_test,
    )

    df = spark.createDataFrame(rows, "pa boolean, pb boolean, y boolean")
    r = mcnemar_test(df, "pa", "pb", "y").collect()[0]
    b = sum(1 for pa, pb, y in rows if (pa == y) and not (pb == y))
    c = sum(1 for pa, pb, y in rows if not (pa == y) and (pb == y))
    assert (r.a_only, r.b_only) == (b, c)
    if b + c > 0:
        assert abs(r.chi2 - (b - c) ** 2 / (b + c)) < 1e-3
    else:
        assert r.chi2 is None


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # stratum
            st.booleans(),                           # treated
            st.booleans(),                           # outcome
        ),
        min_size=4,
        max_size=40,
    )
)
def test_cmh_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        cmh_test,
    )

    df = spark.createDataFrame(rows, "s int, t boolean, y boolean")
    out = cmh_test(df, "t", "y", "s").collect()
    strata: dict = {}
    for s, t, y in rows:
        strata.setdefault(s, []).append((t, y))
    sa = se = sv = 0.0
    num = den = 0.0
    used = 0
    for cells in strata.values():
        n = len(cells)
        if n < 2:
            continue
        used += 1
        a = sum(1 for t, y in cells if t and y)
        b = sum(1 for t, y in cells if t and not y)
        c = sum(1 for t, y in cells if not t and y)
        d = sum(1 for t, y in cells if not t and not y)
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        num += a * d / n
        den += b * c / n
    r = out[0]
    assert r.n_strata_included == used
    assert sum(1 for row in out if row.included) == used
    if sv > 0:
        assert r.chi2 is not None
        assert abs(r.chi2 - (sa - se) ** 2 / sv) < max(
            1e-3, abs((sa - se) ** 2 / sv) * 1e-3
        )
    if den > 0 and num > 0 and r.or_mh is not None:
        assert abs(r.or_mh - num / den) < max(1e-3, num / den * 1e-3)


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=20)
)
def test_pettitt_matches_bruteforce(spark, series):
    import datetime as dt

    from feature_store_fraud_detection_spark.operators.timeseries import (
        pettitt_changepoint,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        ("k", base + dt.timedelta(days=i), float(v))
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    r = pettitt_changepoint(df, "k", "ts", "v").collect()[0]
    ranks = _avg_ranks(series)
    n = len(series)
    u = [
        round(2 * sum(ranks[v] for v in series[: t + 1])) - (t + 1) * (n + 1)
        for t in range(n)
    ]
    # the engine reports the max over INTERIOR prefixes t = 1..n-1
    # (U_n = 0 by construction); earliest day achieving the max
    best = max(abs(x) for x in u[:-1])
    assert r.u_abs_max == best
    first_idx = next(i for i, x in enumerate(u[:-1]) if abs(x) == best)
    assert r.u_at == u[first_idx]
