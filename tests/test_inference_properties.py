"""Property-based checks of the round-9 moment/agreement family: exact
one-pass Spark surfaces vs brute-force pure-Python textbook formulas on
arbitrary small integer datasets."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)


def _var(xs):
    n = len(xs)
    m = sum(xs) / n
    return sum((x - m) ** 2 for x in xs) / (n - 1)


@SET
@given(
    st.lists(st.integers(min_value=-9, max_value=9), min_size=2, max_size=15),
    st.lists(st.integers(min_value=-9, max_value=9), min_size=2, max_size=15),
)
def test_welch_matches_bruteforce(spark, t, c):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        welch_t_test,
    )

    rows = [("t", v) for v in t] + [("c", v) for v in c]
    df = spark.createDataFrame(rows, "g string, v long")
    r = welch_t_test(df, "g", "v", "t").collect()[0]
    mt, mc = sum(t) / len(t), sum(c) / len(c)
    vt, vc = _var(t), _var(c)
    se2 = vt / len(t) + vc / len(c)
    assert abs(r.mean_diff - (mt - mc)) < 1e-3
    assert abs(r.se - math.sqrt(se2)) < 1e-3
    if se2 > 0:
        assert abs(r.t_stat - (mt - mc) / math.sqrt(se2)) < 1e-3
        dfw = se2**2 / (
            (vt / len(t)) ** 2 / (len(t) - 1)
            + (vc / len(c)) ** 2 / (len(c) - 1)
        )
        assert abs(r.df_welch - dfw) < 1e-2
    sp = math.sqrt(
        ((len(t) - 1) * vt + (len(c) - 1) * vc) / (len(t) + len(c) - 2)
    )
    if sp > 0:
        assert abs(r.cohens_d - (mt - mc) / sp) < 1e-3


@SET
@given(
    st.lists(st.integers(min_value=-9, max_value=9), min_size=2, max_size=20)
)
def test_jarque_bera_matches_bruteforce(spark, vals):
    from feature_store_fraud_detection_spark.operators.stats import (
        jarque_bera,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = jarque_bera(df, "g", "v").collect()[0]
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((x - mu) ** 2 for x in vals) / n
    assert abs(r.mean_q - mu) < 1e-3
    if m2 == 0:
        assert r.skewness is None and r.jb_stat is None
        return
    m3 = sum((x - mu) ** 3 for x in vals) / n
    m4 = sum((x - mu) ** 4 for x in vals) / n
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3.0
    jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
    assert abs(r.skewness - skew) < 1e-3
    assert abs(r.ex_kurtosis - exk) < 1e-3
    assert abs(r.jb_stat - jb) < max(1e-3, abs(jb) * 1e-3)


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # item
            st.sampled_from(["a", "b", "c"]),        # r1 cat
            st.sampled_from(["a", "b", "c"]),        # r2 cat
            st.sampled_from(["a", "b", "c"]),        # r3 cat
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_fleiss_matches_bruteforce(spark, items):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        fleiss_kappa,
    )

    rows = [
        (i, f"r{j}", cat)
        for i, *cats in items
        for j, cat in enumerate(cats)
    ]
    df = spark.createDataFrame(rows, "item long, rater string, cat string")
    out = fleiss_kappa(df, "item", "rater", "cat").collect()[0]
    n, rr = len(items), 3
    p_i = []
    for _, *cats in items:
        cnt = Counter(cats)
        p_i.append(
            (sum(c * c for c in cnt.values()) - rr) / (rr * (rr - 1))
        )
    p_bar = sum(p_i) / n
    tot = Counter(cat for _, *cats in items for cat in cats)
    p_e = sum((c / (n * rr)) ** 2 for c in tot.values())
    assert abs(out.p_bar - p_bar) < 1e-3
    assert abs(out.p_e - p_e) < 1e-3
    if p_e < 1.0:
        assert abs(out.kappa - (p_bar - p_e) / (1 - p_e)) < 1e-3
    else:
        assert out.kappa is None


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=15,
    )
)
def test_cochran_q_matches_bruteforce(spark, panel):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        cochran_q,
    )

    rows = [
        (i, f"t{j}", y)
        for i, outs in enumerate(panel)
        for j, y in enumerate(outs)
    ]
    df = spark.createDataFrame(rows, "item long, treat string, y int")
    r = cochran_q(df, "item", "treat", "y").collect()[0]
    k = 3
    tj = [sum(p[j] for p in panel) for j in range(k)]
    ri = [sum(p) for p in panel]
    g = sum(tj)
    den = k * g - sum(x * x for x in ri)
    assert r.n_items == len(panel) and r.k_treatments == 3
    if den > 0:
        q = (k - 1) * (k * sum(x * x for x in tj) - g * g) / den
        assert abs(r.q_stat - q) < 1e-3
    else:
        assert r.q_stat is None


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # ordinal score
            st.integers(min_value=0, max_value=1),   # outcome
        ),
        min_size=4,
        max_size=24,
    )
)
def test_cochran_armitage_matches_bruteforce(spark, rows):
    import pytest

    from feature_store_fraud_detection_spark.operators.evaluation import (
        cochran_armitage,
    )

    df = spark.createDataFrame(rows, "c long, y int")
    levels = {c for c, _ in rows}
    p = sum(y for _, y in rows)
    n = len(rows)
    if len(levels) < 2 or p == 0 or p == n:
        with pytest.raises(Exception, match="cochran_armitage"):
            cochran_armitage(df, "c", "y").collect()
        return
    r = cochran_armitage(df, "c", "y").collect()[0]
    scp = sum(c * y for c, y in rows)
    scn = sum(c for c, _ in rows)
    snc2 = sum(c * c for c, _ in rows)
    t_num = n * scp - p * scn
    var = p * (n - p) * (n * snc2 - scn * scn) / n
    assert r.t_num == t_num
    if var > 0:
        assert abs(r.z_trend - t_num / math.sqrt(var)) < 1e-3
    else:
        assert r.z_trend is None


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=2,
        max_size=20,
    )
)
def test_cronbach_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.stats import (
        cronbach_alpha,
    )

    df = spark.createDataFrame(rows, "a long, b long, c long")
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    cols = list(zip(*rows))
    siv = sum(_var(list(col)) for col in cols)
    tv = _var([sum(t) for t in rows])
    assert abs(r.sum_item_var - siv) < 1e-3
    assert abs(r.total_var - tv) < 1e-3
    if tv > 0:
        assert abs(r.alpha - 1.5 * (1 - siv / tv)) < 1e-3
    else:
        assert r.alpha is None


@SET
@given(
    st.lists(
        st.tuples(
            st.booleans(),                        # treated
            st.booleans(),                        # post
            st.integers(min_value=-9, max_value=9),
        ),
        min_size=8,
        max_size=24,
    )
)
def test_did_matches_bruteforce(spark, rows):
    import pytest

    from feature_store_fraud_detection_spark.operators.evaluation import (
        diff_in_differences,
    )

    df = spark.createDataFrame(rows, "t boolean, p boolean, v long")
    cells = {}
    for t, p, v in rows:
        cells.setdefault((t, p), []).append(v)
    if any(
        len(cells.get(k, [])) < 2
        for k in [(True, False), (True, True), (False, False), (False, True)]
    ):
        with pytest.raises(Exception, match="diff_in_differences"):
            diff_in_differences(df, "t", "p", "v").collect()
        return
    r = diff_in_differences(df, "t", "p", "v").collect()[0]
    m = {k: sum(v) / len(v) for k, v in cells.items()}
    did = (m[(True, True)] - m[(True, False)]) - (
        m[(False, True)] - m[(False, False)]
    )
    se = math.sqrt(
        sum(_var(cells[k]) / len(cells[k]) for k in cells)
    )
    assert abs(r.did - did) < 1e-3
    assert abs(r.se - se) < 1e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),          # item
            st.sampled_from(["u", "v", "w"]),               # rater
            st.sampled_from(["a", "b"]),                    # category
        ),
        min_size=2,
        max_size=24,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_krippendorff_matches_bruteforce(spark, ratings):
    import pytest

    from feature_store_fraud_detection_spark.operators.evaluation import (
        krippendorff_alpha,
    )

    df = spark.createDataFrame(
        ratings, "item long, rater string, cat string"
    )
    by_item: dict = {}
    for i, _, c in ratings:
        by_item.setdefault(i, []).append(c)
    usable = {i: cs for i, cs in by_item.items() if len(cs) >= 2}
    if not usable:
        with pytest.raises(Exception, match="krippendorff_alpha"):
            krippendorff_alpha(df, "item", "rater", "cat").collect()
        return
    r = krippendorff_alpha(df, "item", "rater", "cat").collect()[0]
    assert r.n_items_used == len(usable)
    assert r.n_items_dropped == len(by_item) - len(usable)
    n_tot = sum(len(cs) for cs in usable.values())
    assert r.n_ratings == n_tot
    do_num = 0.0
    for cs in usable.values():
        cnt = Counter(cs)
        ri = len(cs)
        do_num += sum(c * (ri - c) for c in cnt.values()) / (ri - 1)
    tot = Counter(c for cs in usable.values() for c in cs)
    de_num = n_tot * n_tot - sum(c * c for c in tot.values())
    if de_num > 0:
        alpha = 1.0 - (n_tot - 1) * do_num / de_num
        assert abs(r.alpha - alpha) < 1e-3
    else:
        assert r.alpha is None


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=12),
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=12),
)
def test_brown_forsythe_matches_bruteforce(spark, ga, gb):
    from feature_store_fraud_detection_spark.operators.stats import (
        brown_forsythe,
    )

    rows = [("a", v) for v in ga] + [("b", v) for v in gb]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in brown_forsythe(df, "g", "v").collect()}

    def med(xs):
        s = sorted(xs)
        n = len(s)
        return (
            s[n // 2]
            if n % 2
            else s[n // 2 - 1] + (s[n // 2] - s[n // 2 - 1]) * 0.5
        )

    za = [abs(2 * v - 2 * med(ga)) for v in ga]
    zb = [abs(2 * v - 2 * med(gb)) for v in gb]
    assert out["a"].sum_absdev_x2 == round(sum(za))
    assert out["b"].sum_absdev_x2 == round(sum(zb))
    # one-way ANOVA F on the deviations
    allz = za + zb
    n, k = len(allz), 2
    gm = sum(allz) / n
    ssb = len(za) * (sum(za) / len(za) - gm) ** 2 + len(zb) * (
        sum(zb) / len(zb) - gm
    ) ** 2
    ssw = sum((z - sum(za) / len(za)) ** 2 for z in za) + sum(
        (z - sum(zb) / len(zb)) ** 2 for z in zb
    )
    if ssw > 0:
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert abs(out["a"].f_stat - f) < max(1e-3, abs(f) * 1e-3)


@SET
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=24
    )
)
def test_classification_report_matches_bruteforce(spark, rows):
    from feature_store_fraud_detection_spark.operators.evaluation import (
        binary_classification_report,
    )

    df = spark.createDataFrame(rows, "p boolean, y boolean")
    r = binary_classification_report(df, "p", "y").collect()[0]
    tp = sum(1 for p, y in rows if p and y)
    fp = sum(1 for p, y in rows if p and not y)
    fn = sum(1 for p, y in rows if not p and y)
    tn = sum(1 for p, y in rows if not p and not y)
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    assert abs(r.accuracy - (tp + tn) / len(rows)) < 1e-3
    if tp + fp:
        assert abs(r.precision - tp / (tp + fp)) < 1e-3
    else:
        assert r.precision is None
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    if den > 0:
        mcc = (tp * tn - fp * fn) / math.sqrt(den)
        assert abs(r.mcc - mcc) < 1e-3
    else:
        assert r.mcc is None
