"""Property-based checks of the record-linkage family: the blocked
candidate join + agreement-pattern counting that feeds Winkler EM, and
the EM recursion itself, vs a brute-force pure-Python twin on arbitrary
small profile tables (NULL fields, singleton blocks, constant fields)
— round 10's eleventh sweep batch.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

_profiles_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # block
        st.one_of(st.none(), st.integers(0, 2)),  # field 1
        st.one_of(st.none(), st.integers(0, 1)),  # field 2
    ),
    min_size=2,
    max_size=12,
)


def _py_patterns(profiles):
    """All within-block pairs (id_a < id_b) -> agreement-pattern counts
    with the NULL-is-disagreement rule."""
    pats: dict[tuple[int, int], int] = {}
    for i, (b1, x1, y1) in enumerate(profiles):
        for j in range(i + 1, len(profiles)):
            b2, x2, y2 = profiles[j]
            if b1 != b2:
                continue
            a = (
                int(x1 is not None and x2 is not None and x1 == x2),
                int(y1 is not None and y2 is not None and y1 == y2),
            )
            pats[a] = pats.get(a, 0) + 1
    return pats


def _py_em(pats, n_iter=20, init_p=0.1, init_m=0.9, init_u=0.1):
    order = sorted(pats.items(), key=lambda t: t[0], reverse=True)
    n_pairs = sum(c for _, c in order)
    k = 2
    p, m, u = init_p, [init_m] * k, [init_u] * k
    for _ in range(n_iter):
        wcs, ucs = [], []
        for a, c in order:
            t_prod = m[0] if a[0] else (1.0 - m[0])
            t_prod = t_prod * (m[1] if a[1] else (1.0 - m[1]))
            u_prod = u[0] if a[0] else (1.0 - u[0])
            u_prod = u_prod * (u[1] if a[1] else (1.0 - u[1]))
            pm, pu = p * t_prod, (1.0 - p) * u_prod
            if pm + pu == 0.0:
                return None  # degenerate: the operator must fail loud
            w = pm / (pm + pu)
            wcs.append(w * c)
            ucs.append((1.0 - w) * c)
        s_w = wcs[0]
        for x in wcs[1:]:
            s_w = s_w + x
        s_u = ucs[0]
        for x in ucs[1:]:
            s_u = s_u + x
        new_m, new_u = [], []
        for f in range(k):
            num_m = wcs[0] * order[0][0][f]
            num_u = ucs[0] * order[0][0][f]
            for i in range(1, len(order)):
                num_m = num_m + wcs[i] * order[i][0][f]
                num_u = num_u + ucs[i] * order[i][0][f]
            new_m.append(num_m / s_w)
            new_u.append(num_u / s_u)
        m, u, p = new_m, new_u, s_w / float(n_pairs)
    return {"p": p, "m": m, "u": u, "n_pairs": n_pairs,
            "n_patterns": len(order)}


@SET
@given(_profiles_strategy)
def test_em_linkage_matches_bruteforce(spark, profiles):
    import pytest

    from feature_store_fraud_detection_spark.operators.linkage import (
        em_linkage_params,
    )

    rows = [(i, b, x, y) for i, (b, x, y) in enumerate(profiles)]
    df = spark.createDataFrame(rows, "id long, blk long, f1 long, f2 long")

    pats = _py_patterns(profiles)
    if not pats:
        with pytest.raises(Exception, match="em_linkage_params"):
            em_linkage_params(df, "id", ["blk"], ["f1", "f2"])
        return
    expect = _py_em(pats)
    if expect is None:
        with pytest.raises(Exception, match="em_linkage_params"):
            em_linkage_params(df, "id", ["blk"], ["f1", "f2"])
        return
    got = em_linkage_params(df, "id", ["blk"], ["f1", "f2"])
    assert got["n_pairs"] == expect["n_pairs"]
    assert got["n_patterns"] == expect["n_patterns"]
    # the EM recursion is a deterministic float loop over identical
    # pattern counts: results are BIT-equal, not merely close
    assert got["p"] == expect["p"]
    assert got["m"] == expect["m"]
    assert got["u"] == expect["u"]
