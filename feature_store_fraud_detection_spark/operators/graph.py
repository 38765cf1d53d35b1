"""Iterative graph analytics as DataFrame loops: PageRank and BFS levels.

The reference has no graph surface, but its fraud domain is one (cards,
merchants, devices form a transaction graph; fraud rings are its dense
subgraphs). These operators give the engine the two standard primitives —
importance scoring and hop distance — as deterministic, oracle-checkable
DataFrame programs, complementing the connected-components reducer in
``operators.dedup.dedup_clusters``.

Cross-engine determinism: PageRank is computed ENTIRELY in scaled BIGINT
arithmetic (rank mass scaled by 10**12; truncating integer division for
the per-edge contribution and the damping factor). Integer sums are
order-independent and both engines truncate positive integer division
identically, so after any number of iterations the ranks are bit-equal to
the DuckDB twin — no float summation order, no decimal division semantics
in play. The cost is a deterministic rounding loss of < out_degree ulps of
scaled mass per node per iteration (documented, same on both engines).

Scale design: the edge table is hash-partitioned on ``src`` once and
reused across iterations (the per-iteration join re-keys only the rank
table, which is |V|, not |E|); each iteration is one shuffle-join plus one
map-side-combined aggregate, and ``localCheckpoint`` truncates the plan so
iteration N does not replay 1..N-1. Convergence work is O(iterations *
(|E| join + |V| agg)) — the textbook MapReduce PageRank shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank mass is scaled by this (BIGINT) factor; 10**12 leaves headroom for
#: the 85x damping multiply inside int64 even if one node held ALL mass.
PAGERANK_SCALE = 10**12

#: below this node count the per-iteration state table broadcasts (a 1M-row
#: (node, long) table is ~30 MB serialized — inside a comfortable broadcast
#: budget) and the edge table never exchanges; above it, edges are pre-keyed
#: once and iterations run co-partitioned SMJs.
SMALL_GRAPH_NODE_LIMIT = 1_000_000

#: per-task floor for the cached edge table in the small-graph regime: tiny
#: graphs coalesce to one task (a sub-100k-edge task is mostly scheduling
#: overhead), but the partition count is CAPPED at the session's default
#: parallelism, never above it, so a mid-size graph (the 1M-edge sf0.1 trade
#: graph) spreads each iteration's join+agg across cores instead of
#: serializing on a single task. Swept empirically at sf0.1: 40k/task is
#: scheduling-bound, 2M/task is single-task-bound; 120k is the knee for
#: both pagerank and bfs.
EDGES_PER_TASK = 120_000


def _edge_partitions(spark, n_edges: int) -> int:
    """Coalesce target for cached small-regime edges: one task per
    EDGES_PER_TASK edges, at least 1, at most the core count."""
    cores = spark.sparkContext.defaultParallelism
    return max(1, min(cores, n_edges // EDGES_PER_TASK + 1))


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 4,
    damping_pct: int = 85,
    assume_distinct: bool = False,
    symmetric: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list -> (node, rank_scaled).

    ``rank_scaled`` is the rank mass times :data:`PAGERANK_SCALE`, an exact
    BIGINT (divide by 1e12 for the conventional value). Update rule per
    iteration, all in integer arithmetic::

        contrib(e)   = rank[src] div out_degree[src]
        rank'[v]     = (100-d)*S div (100*N)  +  d * sum(contrib) div 100

    Dangling-node mass (nodes with no out-edges) is dropped, the standard
    MapReduce simplification — totals decay slightly instead of summing to
    exactly S. Nodes are the union of sources and destinations.

    The edge set is deduplicated (skipped when the caller declares
    ``assume_distinct`` — a dedup is a full |E| shuffle), pre-keyed on
    ``src`` and persisted: every iteration's join reuses that one
    partitioning, so the steady-state cost is shuffling the |V|-row rank
    table, never the |E|-row edge table.

    ``weight_col``: WEIGHTED PageRank — contributions become
    rank * w / strength(src) (strength = sum of outgoing weights),
    computed as the exact integer floor via
    ``(r div s)*w + ((r mod s)*w) div s`` (the identity
    r*w = (r div s)*s*w + (r mod s)*w), which never forms the r*w
    product, so ranks stay bit-exact without long overflow as long as
    strength * max_weight < 2^63 (integer weights required; duplicate
    (src, dst) rows have their weights SUMMED unless assume_distinct).
    """
    if weight_col is None:
        e = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        if not assume_distinct:
            e = e.distinct()
    else:
        # fail-loud weight validation (the repo's overflow_checked
        # convention): a NULL/zero/negative weight would make
        # `rank div strength` NULL under non-ANSI mode and silently drop
        # that node's whole contribution mass — abort with the offending
        # value instead. One vectorized comparison per edge.
        w_raw = F.col(weight_col).cast("long")
        w_checked = F.when(w_raw > 0, w_raw).otherwise(
            F.raise_error(
                F.format_string(
                    "pagerank: weight_col must be a positive integer "
                    "(got %s) — zero/negative/NULL weights silently "
                    "drop contribution mass",
                    w_raw.cast("string"),
                )
            ).cast("long")
        )
        e = edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            w_checked.alias("w"),
        )
        if not assume_distinct:
            e = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    # persist the edge pipeline BEFORE any count probe: the nodes.count job
    # below then materializes the cache as a side effect, and every later
    # pass (edge count, degree, the per-iteration joins) reads the cache —
    # the upstream scan/join/distinct runs exactly once.
    e = e.persist()
    # on a symmetric edge list every node appears as a source, so the
    # dst-side union (and its extra |E|-row shuffle input) is redundant —
    # callers with undirected graphs declare it. The degree table doubles
    # as the node table there (distinct src == deg's keys), so the separate
    # nodes distinct+persist disappears entirely in the symmetric case.
    deg_expr = (
        F.count(F.lit(1)) if weight_col is None else F.sum("w")
    ).alias("deg")
    # one aggregate carries degree + per-src edge count (+ per-src max
    # weight when weighted), so EVERY driver scalar below — |V|, |E|, the
    # overflow bounds — folds into a single job over this cached table
    # instead of separate count()/count()/crossJoin-agg jobs (r12; the
    # fn-call jobs are part of every caller's critical path)
    deg_aggs = [deg_expr, F.count(F.lit(1)).alias("__ec")]
    if weight_col is not None:
        deg_aggs.append(F.max("w").alias("__wmax"))
    deg_full = e.groupBy("src").agg(*deg_aggs).persist()
    deg_src = deg_full.select("src", "deg")
    if symmetric:
        nodes = deg_src.select(F.col("src").alias("node"))
        stat_aggs = [
            F.count(F.lit(1)).alias("nv"),
            F.sum("__ec").alias("ne"),
        ]
        if weight_col is not None:
            stat_aggs += [
                F.max("deg").alias("smax"),
                F.max("__wmax").alias("wmax"),
            ]
        stats = deg_full.agg(*stat_aggs).first()  # materializes e + deg
        n_nodes = stats["nv"]
        n_edges = int(stats["ne"] or 0)
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n_nodes = nodes.count()
        n_edges = e.count()  # cached scan — shares the materialization
        if weight_col is not None:
            stats = deg_full.agg(
                F.max("deg").alias("smax"), F.max("__wmax").alias("wmax")
            ).first()
    if weight_col is not None:
        # the exact-integer contribution identity needs
        # strength * max_weight < 2^63 (docstring); CHECK it instead of
        # documenting it — the maxes ride the single stats job above
        bounds = stats
        if (
            bounds["smax"] is not None
            and bounds["wmax"] is not None
            and int(bounds["smax"]) * int(bounds["wmax"]) >= 2**63
        ):
            raise ValueError(
                "pagerank: strength*max_weight = "
                f"{int(bounds['smax'])}*{int(bounds['wmax'])} >= 2^63 — "
                "the exact integer contribution path would overflow; "
                "rescale the weights"
            )
    # Two execution regimes, same arithmetic (the gate tests assert both):
    # - SMALL graph (|V| fits a broadcast): skip the src pre-keying — the
    #   per-iteration join broadcasts the |V|-row rank table, so the edge
    #   side never exchanges at all; coalesce the cached edges so a handful
    #   of rounds isn't 32-tiny-task stage overhead per round.
    # - LARGE graph: hash-partition edges on src ONCE; every iteration's
    #   SMJ reuses that exchange and only the rank table moves.
    if n_nodes == 0:
        # empty edge list (round-10 degenerate-probe finding, surfaced
        # via textrank on a sub-min_count corpus): ranks of nothing is
        # an EMPTY frame with the right schema — not a Python
        # ZeroDivisionError from the integer seed split below
        empty = nodes.select(
            "node", F.lit(0).cast("long").alias("rank_scaled")
        )
        deg_full.unpersist()
        if not symmetric:
            nodes.unpersist()
        e.unpersist()
        return empty
    small_graph = n_nodes <= SMALL_GRAPH_NODE_LIMIT
    if small_graph:
        work, deg = e, deg_src
    else:
        work = e.repartition("src")
        deg = work.groupBy("src").agg(deg_expr)
    ed_cached = work.join(
        F.broadcast(deg) if small_graph else deg, "src"
    ).persist()
    ed = ed_cached
    if small_graph:
        # |ed| == |e| (every edge keeps exactly one degree row), so the
        # already-known edge count sizes the coalesce — no extra count job
        ed = ed_cached.coalesce(_edge_partitions(edges.sparkSession, n_edges))
    base = ((100 - damping_pct) * PAGERANK_SCALE) // (100 * n_nodes)
    init = PAGERANK_SCALE // n_nodes
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_scaled"))
    for i in range(iterations):
        ranks = pagerank_iteration(
            ed,
            nodes,
            ranks,
            base,
            damping_pct,
            broadcast_ranks=small_graph,
            weighted=weight_col is not None,
            # a symmetric graph has no contribution-less nodes: every node
            # has in-edges, so contribs already covers all of them and the
            # per-iteration left join against the node table is skipped
            all_nodes_receive=symmetric,
        )
        # Plan depth grows linearly per iteration, so a handful of rounds
        # runs best as ONE chained-shuffle job (AQE coalesces each round);
        # only deep loops need the lineage cut, and each eager checkpoint
        # costs a full job submission — so cut every 5th round only.
        if (i + 1) % 5 == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # materialize ONCE (while ed/nodes are still cached), then release them
    ranks = ranks.localCheckpoint(eager=True)
    ed_cached.unpersist()
    deg_full.unpersist()
    if not symmetric:
        nodes.unpersist()
    e.unpersist()
    return ranks


def pagerank_iteration(
    ed: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    base: int,
    damping_pct: int,
    broadcast_ranks: bool = False,
    all_nodes_receive: bool = False,
    weighted: bool = False,
) -> DataFrame:
    """One PageRank round: contribute along edges, damp, add teleport mass.

    Exposed separately so the plan-quality gate can assert the iteration's
    shuffle shape (the |E|-row ``ed`` side, pre-keyed on src, must not
    re-exchange; only the |V|-row rank table moves — or, with
    ``broadcast_ranks``, nothing moves but the map-side-combined
    contribution aggregate). With ``all_nodes_receive`` (symmetric graphs:
    every node has in-edges) the contribution aggregate already covers the
    full node set, so the round is join-free after the edge contribution."""
    rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
    contrib_expr = (
        # exact floor(rank*w/deg) without the rank*w product — see
        # pagerank's weight_col note for the identity and overflow bound
        "(rank_scaled div deg) * w + ((rank_scaled % deg) * w) div deg"
        if weighted
        else "rank_scaled div deg"
    )
    contribs = (
        ed.join(rank_side, ed.src == ranks.node)
        .select(F.col("dst"), F.expr(contrib_expr).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("agg"))
    )
    new_rank = (
        (F.lit(base) + F.expr(f"({damping_pct} * coalesce(agg, 0L)) div 100"))
        .cast("long")
        .alias("rank_scaled")
    )
    if all_nodes_receive:
        return contribs.select(F.col("dst").alias("node"), new_rank)
    # the rank-update join: both sides are |V| rows; in the broadcast
    # regime hand Catalyst the small aggregated side so each iteration
    # costs zero exchanges instead of two 16k-row ones
    contrib_side = F.broadcast(contribs) if broadcast_ranks else contribs
    return nodes.join(contrib_side, nodes.node == contribs.dst, "left").select(
        "node", new_rank
    )


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 6,
    assume_distinct: bool = False,
) -> DataFrame:
    """Minimum hop distance from a seed set -> (node, level), level <= max_hops.

    Frontier-free formulation: every reachable node carries its current best
    level; one round relaxes all edges (``level[dst] = min(level[dst],
    level[src]+1)``). ``max_hops`` rounds of relaxation give exact distances
    up to ``max_hops`` (each round extends the certified radius by one).
    Unreached nodes are absent from the output.

    Scale: per round one join keyed on ``src`` + one min-aggregate — the
    same shuffle profile as a single dedup_clusters round; the edge table is
    pre-keyed and persisted across rounds.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e_cached = e.persist()
    n_edges = e_cached.count()  # driver scalar: picks the execution regime
    # same dual regime as pagerank: broadcast the (bounded-by-|V|) level
    # table and coalesce the cached edges when the graph is small; pre-key
    # the edges once for co-partitioned SMJs when it is not.
    small_graph = n_edges <= 2 * SMALL_GRAPH_NODE_LIMIT
    if small_graph:
        e = e_cached.coalesce(_edge_partitions(edges.sparkSession, n_edges))
    else:
        e_cached2 = e_cached.repartition("src").persist()
        e_cached.unpersist()
        e_cached = e_cached2
        e = e_cached
    # a NULL seed id is not a node: drop it (an agg-min seed over an
    # empty table yields one NULL row, and NULL never equi-joins — it
    # would silently seed nothing while still occupying a row)
    levels = (
        seeds.filter(F.col(node_col).isNotNull())
        .select(
            F.col(node_col).alias("node"),
            F.lit(0).cast("int").alias("level"),
        )
        .distinct()
    )
    for i in range(max_hops):
        lvl_side = F.broadcast(levels) if small_graph else levels
        levels = (
            e.join(lvl_side, e.src == levels.node)
            .select(F.col("dst").alias("node"), (F.col("level") + 1).alias("level"))
            .unionByName(levels)
            .groupBy("node")
            .agg(F.min("level").cast("int").alias("level"))
        )
        # r13: checkpoint EVERY round, not every 5th. Unlike pagerank's
        # single-reference iteration, this round body references
        # ``levels`` TWICE (join side + union side), so a chained plan
        # duplicates every prior round's subtree 2x per round —
        # measured at 4 rounds: 31 Exchange / 18 parquet scans /
        # 0 ReusedExchange in one 1,943-line plan, 33 jobs. The eager
        # per-round cut keeps lineage linear: 21 jobs, -11% wall,
        # rows identical (plans/r13/bfs_levels_*.txt).
        if (i + 1) < max_hops:
            levels = levels.localCheckpoint(eager=True)
    # materialize ONCE (while the edge cache is live), then release it
    levels = levels.localCheckpoint(eager=True)
    e_cached.unpersist()
    return levels


def triangle_stats(
    edges: DataFrame,
    src: str,
    dst: str,
) -> DataFrame:
    """Global triangle census of an undirected graph: one row
    (n_triangles, n_wedges, clustering) where clustering is the global
    coefficient 3*triangles/wedges (4-decimal stable rounding).

    Algorithm: DEGREE-ORDERED ORIENTATION — every undirected edge points
    from its lower-(degree, id) endpoint to the higher one, each triangle
    is counted exactly once at its lowest-order corner, and (the scale
    property) every node's OUT-degree is O(sqrt(|E|)) regardless of how
    big a hub it is, so the wedge join cannot explode quadratically on hot
    nodes the way the naive id-ordered 3-way self-join does. The order is
    a ``struct(degree, node)`` compared lexicographically — safe for ANY
    id range (a packed ``degree * 2^40 + node`` long would silently
    collide for 60-bit md5-derived ids or degrees >= 2^23). The order
    participates only in filters and projections, never as a join or
    shuffle key, so the struct comparator costs nothing in the exchanges.

    Shape: one keyed degree aggregate, two broadcast-or-shuffle joins to
    attach orders, then wedge-join (keyed on the corner) + closing-edge
    join (keyed on the (v, w) pair) + a global count. Input edges may
    contain duplicates/self-loops/either direction — canonicalized here.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    a, b = F.col(src), F.col(dst)
    und = (
        edges.filter(a != b)
        .select(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ordv = deg.select(
        "n", (F.col("d") * F.lit(2**40) + F.col("n")).alias("o")
    )
    # oriented edges: lower order -> higher order, endpoints carried as
    # (node, order) pairs
    oe = (
        und.join(ordv.select(F.col("n").alias("u"), F.col("o").alias("ou")), "u")
        .join(ordv.select(F.col("n").alias("v"), F.col("o").alias("ov")), "v")
        .select(
            F.when(F.col("ou") < F.col("ov"), F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(F.col("ou") < F.col("ov"), F.col("v")).otherwise(F.col("u")).alias("t"),
            F.least("ou", "ov").alias("os"),
            F.greatest("ou", "ov").alias("ot"),
        )
    )
    wedges = (
        oe.alias("e1")
        .join(oe.alias("e2"), F.col("e1.s") == F.col("e2.s"))
        .filter(F.col("e1.ot") < F.col("e2.ot"))
        .select(
            F.col("e1.t").alias("wv"), F.col("e2.t").alias("ww")
        )
    )
    closed = wedges.join(
        oe.select(F.col("s").alias("wv"), F.col("t").alias("ww")),
        ["wv", "ww"],
    )
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    # d*(d-1) is even, so integer div by 2 is exact — stays in BIGINT all
    # the way (no double rounding at extreme degree sums)
    wed = deg.agg(
        F.expr("CAST(sum(d * (d - 1)) div 2 AS BIGINT)").alias("n_wedges")
    )
    return tri.crossJoin(wed).select(
        "n_triangles",
        "n_wedges",
        # zero wedges (every component a single edge): clustering is
        # undefined — NULL, not an ANSI divide-by-zero (round-10
        # property-sweep finding, the anova_f/logrank zero-denominator
        # class)
        round4_stable(
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0)
                * F.col("n_triangles")
                / F.col("n_wedges").cast("double"),
            )
        ).alias("clustering"),
    )


def kcore(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    max_rounds: int = 50,
) -> DataFrame:
    """k-core of an undirected graph: the maximal subgraph in which every
    node has degree >= k, by iterative peeling (drop all nodes with
    degree < k, re-count, repeat to fixpoint) -> (node, degree) with
    degree measured INSIDE the core. The classic screen for "who is in
    the densely-connected heart of the graph" — fraud rings, co-purchase
    cliques, boilerplate hubs; the 2-core alone strips all trees/pendant
    chains and keeps exactly the cyclic structure.

    Self-loops are dropped and the edge list deduplicated; each input row
    is one undirected edge (callers supply each pair once, u < v).

    Scale design (the pagerank/bfs conventions): the edge set persists
    once; each round is one degree count (map-side combined) + two
    semi-joins keyed on the endpoint — the |V'|-row survivor table moves,
    the edge table re-shuffles only as it SHRINKS (each round's semi-join
    output is strictly smaller). Convergence: if no node fell below k the
    edge set is unchanged — fixpoint (peeling is monotone, rounds <=
    peel depth, typically <= a dozen on real graphs). Driver state is one
    count per round; lineage cut every 3rd round. For full coreness
    decomposition at 100 TB, sweep k ascending and reuse the previous
    core as the input — each sweep starts from the already-shrunk graph.
    """
    e = _prep_undirected(edges, src_col, dst_col)
    keep, e = _peel_to_core(e, k, max_rounds)
    out = keep.localCheckpoint(eager=True)
    keep.unpersist()
    e.unpersist()
    return out


def _prep_undirected(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Dedup + self-loop-drop an undirected edge list -> persisted (u, v),
    coalesced to ~EDGES_PER_TASK rows/task (capped at cores): the peel
    loops run dozens of tiny jobs over this cache, and a 3k-edge graph
    spread over 32 post-distinct shuffle partitions pays 32 tasks of
    scheduling per round for microseconds of work each."""
    raw = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    n = raw.count()
    e = raw.coalesce(
        _edge_partitions(edges.sparkSession, n)
    ).persist()
    e.count()  # materialize the coalesced cache before dropping raw's
    raw.unpersist()
    return e


def _peel_to_core(
    e: DataFrame, k: int, max_rounds: int
) -> tuple[DataFrame, DataFrame]:
    """Peel a persisted (u, v) edge set to its k-core.

    Returns ``(keep, e_final)`` — the surviving (node, degree) table and
    the k-core's edge set, BOTH persisted (caller unpersists). The input
    ``e`` is unpersisted whenever a round shrinks it. Shared by
    :func:`kcore` (one k) and :func:`coreness` (ascending-k sweep reusing
    each round's shrunk graph — the sweep never restarts from the full
    edge list, per the 100 TB note in kcore's docstring).
    """
    prev_nodes = -1
    keep = None
    for r in range(max_rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionByName(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        new_keep = deg.filter(F.col("degree") >= k).persist()
        n = new_keep.count()
        if keep is not None:
            keep.unpersist()
        keep = new_keep
        if n == prev_nodes or n == 0:
            break
        prev_nodes = n
        ids = keep.select("node")
        small = n <= SMALL_GRAPH_NODE_LIMIT
        lhs = F.broadcast(ids) if small else ids
        e2 = (
            e.join(lhs.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(
                F.broadcast(ids).withColumnRenamed("node", "v")
                if small
                else ids.withColumnRenamed("node", "v"),
                "v",
                "left_semi",
            )
        )
        if (r + 1) % 3 == 0:
            e2 = e2.localCheckpoint(eager=True)
        e2 = e2.persist()
        e.unpersist()
        e = e2
    return keep, e


def coreness(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k_cap: int | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """Full k-core decomposition: (node, coreness) for every node of the
    undirected graph, where coreness(n) = the largest k such that n is in
    the k-core — the standard density rank (degeneracy ordering) that one
    number per node summarizes: trees/pendants are 1, cycles 2, cliques
    |C|-1. With ``k_cap`` the report is min(coreness, k_cap): sweeps stop
    at the cap and everything still alive is graded "k_cap+" — the usual
    production shape ("rank the heart of the graph to depth 8") that also
    bounds worst-case sweep count on pathological inputs.

    Algorithm: ascending-k peel sweeps REUSING each shrunk graph — the
    k-core is peeled FROM the (k-1)-core's edge set, never from the full
    graph (``_peel_to_core`` keeps the persisted survivor edge set
    between sweeps). Nodes present in the (k-1)-core but absent from the
    k-core have coreness exactly k-1. Every node appearing in an edge has
    coreness >= 1 (self-loops dropped), so sweeps start at k=2.

    Scale: total work is sum over k of (rounds_k x (|E_k| semi-join +
    |V_k| degree agg)) where E_k/V_k shrink monotonically — the dominant
    cost is the early sweeps on the big graph, exactly the cost kcore(2)
    already pays; each additional k adds work proportional to the
    ALREADY-SHRUNK core. Per-sweep drop tables are localCheckpointed
    (bounded driver state: one count per round), and the result union is
    k_cap-bounded. Matula-Beck sequential peel is inherently serial;
    this parallel-rounds formulation is the distributed standard.
    """
    e = _prep_undirected(edges, src_col, dst_col)
    survivors = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    parts: list[DataFrame] = []
    k = 2
    while True:
        if k_cap is not None and k > k_cap:
            parts.append(
                survivors.withColumn(
                    "coreness", F.lit(k_cap).cast("int")
                ).localCheckpoint(eager=True)
            )
            survivors.unpersist()
            break
        keep, e_peeled = _peel_to_core(e, k, max_rounds)
        # CUT LINEAGE between sweeps: each peel round references the prior
        # edge set several times (degree union + two semi-joins), so the
        # uncut plan grows EXPONENTIALLY across sweeps — checkpointing the
        # sweep's output keeps every sweep's plan O(rounds), not O(2^k).
        e = e_peeled.localCheckpoint(eager=True)
        e_peeled.unpersist()
        kept_ids = keep.select("node").localCheckpoint(eager=True)
        keep.unpersist()
        dropped = (
            survivors.join(kept_ids, "node", "left_anti")
            .withColumn("coreness", F.lit(k - 1).cast("int"))
            .localCheckpoint(eager=True)
        )
        parts.append(dropped)
        survivors.unpersist()
        if kept_ids.isEmpty():
            break
        survivors = kept_ids
        k += 1
    e.unpersist()
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def adamic_adar(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    top_n: int = 50,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction: for every UNLINKED node pair (a, b)
    at distance 2, score = sum over common neighbors c of 1/ln(deg(c)) —
    the classic "who should be connected" ranking (fraud-ring completion,
    co-purchase recommendation). Returns the top_n pairs as
    (node_a, node_b, n_common, score), ordered by (score desc, a, b).

    Shape: one degree aggregate, one wedge self-join keyed ON THE COMMON
    NEIGHBOR c (each wedge (a-c-b) is enumerated exactly once via a < b),
    one anti-join to drop already-linked pairs, one keyed aggregate. The
    wedge join is inherently sum-of-deg(c)^2 rows — that is the operator's
    definition, not an implementation choice; ``max_hub_degree`` optionally
    EXCLUDES intermediates above a degree cap (a hub c contributes only
    1/ln(deg) ~= 0.1 per pair but deg^2 wedge rows — at 100 TB, cap hubs
    and document the deflation; the default is exact).

    Determinism: deg is integer; 1/ln(deg) doubles are summed in SORTED
    order per pair (array_sort fold — the repo's float-summation rule),
    then floor-rounded to 4; ln() parity Spark-vs-DuckDB is relied on
    repo-wide (token_tfidf). deg(c) >= 2 for any wedge center, so ln > 0.
    """
    from feature_store_fraud_detection_spark.functions.numeric import (
        round4_stable,
    )

    e = _prep_undirected(edges, src_col, dst_col)
    adj = e.select(F.col("u").alias("c"), F.col("v").alias("n")).unionByName(
        e.select(F.col("v").alias("c"), F.col("u").alias("n"))
    )
    deg = adj.groupBy("c").agg(F.count(F.lit(1)).alias("deg"))
    if max_hub_degree is not None:
        deg = deg.filter(F.col("deg") <= max_hub_degree)
    adjd = adj.join(deg, "c")  # co-partitioned on c with the wedge join
    a, b = adjd.alias("a"), adjd.alias("b")
    wedges = a.join(
        b,
        (F.col("a.c") == F.col("b.c")) & (F.col("a.n") < F.col("b.n")),
    ).select(
        F.col("a.n").alias("node_a"),
        F.col("b.n").alias("node_b"),
        (F.lit(1.0) / F.log(F.col("a.deg").cast("double"))).alias("__w"),
    )
    linked = e.select(
        F.least("u", "v").alias("node_a"), F.greatest("u", "v").alias("node_b")
    )
    scored = (
        wedges.join(linked, ["node_a", "node_b"], "left_anti")
        .groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            round4_stable(
                F.aggregate(
                    F.array_sort(F.collect_list("__w")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("score"),
        )
    )
    # materialize the bounded top-n WHILE e is cached (the plan reads the
    # edge cache 5 times — adj twice, both wedge sides, the anti-join;
    # unpersisting before execution would recompute the upstream that many
    # times), then release the cache — the kcore/coreness convention.
    out = (
        scored.orderBy(F.col("score").desc(), "node_a", "node_b")
        .limit(top_n)
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    return out


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    max_rounds: int = 6,
    assert_converged: bool = False,
) -> DataFrame:
    """Weighted single-source(-set) shortest paths -> (node, dist) — the
    weighted sibling of :func:`bfs_levels`: Bellman-Ford relaxation
    rounds ``dist[dst] = min(dist[dst], dist[src] + w)``, exact after
    ``max_rounds`` rounds for every shortest path of at most that many
    edges. Weights must be POSITIVE BIGINTs (integer min/plus is
    order-independent and bit-equal cross-engine — the same reason
    pagerank runs in scaled-integer arithmetic); NULL/zero/negative
    weights fail loud, matching the weighted-pagerank convention.

    ``assert_converged=True`` runs ONE extra relaxation round and fails
    loud if any distance still improves — the data-derived convergence
    check (same policy as the coreness oracle's peel-fixpoint assertion)
    for graphs whose diameter is believed, not known. Unreached nodes
    are absent from the output.

    Scale: identical shuffle profile to bfs_levels — per round one join
    keyed on ``src`` + one min-aggregate over (|V|-bounded) distance
    rows; the edge table is persisted (and pre-keyed in the large-graph
    regime) once across rounds.
    """
    w_ok = F.when(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0),
        F.col(weight_col).cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "sssp: weight must be a positive integer (got %s for "
                "edge %s -> %s)",
                F.col(weight_col).cast("string"),
                F.col(src_col).cast("string"),
                F.col(dst_col).cast("string"),
            )
        )
    )
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        w_ok.alias("w"),
    )
    e_cached = e.persist()
    n_edges = e_cached.count()
    small_graph = n_edges <= 2 * SMALL_GRAPH_NODE_LIMIT
    if small_graph:
        e = e_cached.coalesce(_edge_partitions(edges.sparkSession, n_edges))
    else:
        e_cached2 = e_cached.repartition("src").persist()
        e_cached.unpersist()
        e_cached = e_cached2
        e = e_cached
    # NULL seed rows dropped (see bfs_levels): a NULL node never
    # equi-joins, so it would relax nothing — worse, the convergence
    # check's left join counts the unjoinable row as "still improving"
    # (round-10 degenerate-probe finding at k=0)
    dists = (
        seeds.filter(F.col(node_col).isNotNull())
        .select(
            F.col(node_col).alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        )
        .distinct()
    )

    def _relax(d: DataFrame) -> DataFrame:
        d_side = F.broadcast(d) if small_graph else d
        return (
            e.join(d_side, e.src == d.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .unionByName(d)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )

    for i in range(max_rounds):
        dists = _relax(dists)
        # r13: checkpoint every round — _relax references ``d`` twice
        # (join side + union side), so chained rounds duplicate every
        # prior round's subtree 2x per round (bfs_levels' measured
        # defect; same loop shape). The eager cut keeps lineage linear.
        if (i + 1) < max_rounds:
            dists = dists.localCheckpoint(eager=True)
    dists = dists.localCheckpoint(eager=True)
    if assert_converged:
        improved = (
            _relax(dists)
            .alias("nxt")
            .join(dists.alias("cur"), "node", "left")
            .filter(
                F.col("cur.dist").isNull()
                | (F.col("nxt.dist") < F.col("cur.dist"))
            )
            .count()
        )
        if improved:
            e_cached.unpersist()
            raise ValueError(
                f"sssp: {improved} distances still improve after "
                f"{max_rounds} rounds — raise max_rounds (graph deeper "
                "than assumed)"
            )
    e_cached.unpersist()
    return dists
