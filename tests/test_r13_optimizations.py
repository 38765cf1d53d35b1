"""Round-13 optimization equivalence pins.

Each test pins an r13 rewrite head-to-head against an independent form:
the persisted-cuts rank machinery (one cut multiset for every consumer)
must produce the exact sharded == un-sharded ranks, and the
dedup_clusters change-flag convergence probe must label components
identically to exhaustive propagation.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rank_stats_sharded_equals_unsharded(spark):
    """mann_whitney_u / wilcoxon_signed_rank / ks_two_sample: the
    quantile-sharded prefix sum (persisted approx_percentile cuts, r13)
    must equal the single-sort n_buckets=1 form on every reported
    number — ranks are cut-invariant, and the persisted 1-row cuts
    frame guarantees one multiset for both the offsets and the ranked
    subtree."""
    from feature_store_fraud_detection_spark.operators.stats import (
        ks_two_sample,
        mann_whitney_u,
        wilcoxon_signed_rank,
    )

    df = spark.createDataFrame(
        [(i % 11, i % 2) for i in range(400)], "v int, t int"
    )
    for nb in (1, 8):
        row = mann_whitney_u(df, "t", "v", 1, n_buckets=nb).collect()[0]
        if nb == 1:
            base = row
    assert row == base

    for nb in (1, 8):
        row = ks_two_sample(df, "t", "v", 1, n_buckets=nb).collect()[0]
        if nb == 1:
            base = row
    assert row == base

    d = spark.createDataFrame(
        [((i * 7) % 23 - 11,) for i in range(300)], "d4 bigint"
    )
    for nb in (1, 8):
        row = wilcoxon_signed_rank(d, "d4", n_buckets=nb).collect()[0]
        if nb == 1:
            base = row
    assert row == base


def test_dedup_clusters_flag_probe_matches_exhaustive(spark):
    """The r13 convergence probe (a change flag carried on the
    checkpointed labels frame, replacing the |V|-vs-|V| self-join) must
    produce the same components as running every round without early
    exit — exercised on a chain whose diameter forces several
    propagation rounds."""
    from feature_store_fraud_detection_spark.operators.dedup import (
        dedup_clusters,
    )

    # chain 0-1-2-...-9 (diameter 9) + an isolated pair + singletons
    chain = [(i, i + 1) for i in range(9)]
    pairs = spark.createDataFrame(
        chain + [(20, 21)], "id_a int, id_b int"
    )
    ids = spark.createDataFrame(
        [(i,) for i in list(range(10)) + [20, 21, 30]], "doc_id int"
    )
    out = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_clusters(pairs, ids, "doc_id").collect()
    }
    assert all(out[i] == 0 for i in range(10))
    assert out[20] == 20 and out[21] == 20
    assert out[30] == 30

    # max_iterations below the diameter: no early exit possible, the
    # flag probe must not terminate the loop prematurely either
    partial = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_clusters(pairs, ids, "doc_id", max_iterations=2)
        .collect()
    }
    # after 2 rounds node 9 has seen labels from at most 2^2 hops of
    # min-propagation pressure; exact value depends on the propagation
    # schedule, but node 0's component label is already 0 near the seed
    assert partial[0] == 0 and partial[1] == 0


def test_spearman_explicit_single_bucket_matches_default(spark):
    """spearman_rho(n_buckets=1) — the caller-forced un-sharded form the
    r13 probe guard no longer overrides — must equal the default
    (probe-selected) regime exactly."""
    from feature_store_fraud_detection_spark.operators.stats import (
        spearman_rho,
    )

    df = spark.createDataFrame(
        [(i % 17, (i * 3) % 29) for i in range(500)], "x int, y int"
    )
    a = spearman_rho(df, "x", "y").collect()[0]
    b = spearman_rho(df, "x", "y", n_buckets=1).collect()[0]
    assert a == b
