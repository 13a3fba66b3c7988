"""Distributed graph analytics over co-occurrence graphs.

Companion to dedup.neardup_components (connected components): here the
graph-shaped corpus statistics — degree distribution, triangle count,
global clustering coefficient — computed with joins only, no vertex
programs.

Scale design (100 TB):
- Edge generation from a bipartite fact table (order x part) is
  quadratic in basket size, so baskets above ``max_basket`` are
  excluded deterministically (same hot-cell discipline as
  similarity.blocked_neardup).
- The triangle join enumerates WEDGES (2-paths) and closes them against
  the edge set. Wedge count explodes on high-degree vertices, so edges
  are first ORIENTED from the lower-(degree, id) endpoint to the higher
  one: every vertex's oriented out-degree is O(sqrt(edges)) on any
  graph, which bounds the wedge join by m^1.5 instead of sum(d^2) — the
  standard compact-forward bound. The triangle COUNT is orientation-
  invariant (each triangle has exactly one acyclic orientation), so a
  plain id-ordered oracle computes the identical number.
- All outputs are exact integers plus one final division — no float
  accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._lifecycle import release_cached, track as _track  # noqa: F401  (shared lifecycle)


def cooccurrence_edges(
    facts: DataFrame, group_col: str, item_col: str, max_basket: int = 1000
) -> DataFrame:
    """Distinct undirected edges (s < d) between items sharing a group
    (co-purchase, co-citation, co-occurrence). Groups with more than
    ``max_basket`` distinct items are dropped deterministically."""
    items = facts.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("p")
    ).distinct()
    sizes = items.groupBy("g").agg(F.count(F.lit(1)).alias("_n"))
    ok = items.join(F.broadcast(sizes.filter(F.col("_n") <= max_basket).select("g")), "g")
    a = ok.select("g", F.col("p").alias("s"))
    b = ok.select("g", F.col("p").alias("d"))
    return (
        a.join(b, "g")
        .filter(F.col("s") < F.col("d"))
        .select("s", "d")
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex degree of an undirected (s < d) edge list."""
    ends = edges.select(F.col("s").alias("v")).unionAll(edges.select(F.col("d").alias("v")))
    return ends.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row graph summary: vertex/edge/wedge/triangle counts and the
    global clustering coefficient (3*triangles / wedges).

    Triangles are counted on degree-oriented edges (low (deg, id) ->
    high), bounding the quadratic term at skewed vertices, as per-edge
    sorted-adjacency intersections (see inline note). Three shuffles
    total, each on a vertex key.

    The edge list and its oriented form are persisted (they feed the
    degree, wedge, close and count branches — without the persist every
    branch would re-derive the co-occurrence join from the fact table).
    Call :func:`release_cached` on the result when done."""
    edges = edges.persist()
    deg = degrees(edges)
    ds = deg.select(F.col("v").alias("s"), F.col("deg").alias("_ds"))
    dd = deg.select(F.col("v").alias("d"), F.col("deg").alias("_dd"))
    withdeg = edges.join(ds, "s").join(dd, "d")
    s_first = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col("s") < F.col("d"))
    )
    oriented = withdeg.select(
        F.when(s_first, F.col("s")).otherwise(F.col("d")).alias("lo"),
        F.when(s_first, F.col("d")).otherwise(F.col("s")).alias("hi"),
    ).persist()
    # Count per-edge sorted-adjacency intersections instead of
    # materializing the wedge relation: tri = sum over oriented edges
    # (a,b) of |N+(a) ∩ N+(b)|. Same m^1.5 element bound as the wedge
    # join (arrays are bounded by the oriented out-degree <= sqrt(2m)),
    # but the quadratic term runs as an in-memory array intersection per
    # edge rather than a 3-column shuffle of every wedge — A/B at sf0.1
    # (1.2M edges, 148M wedges): 10.7 s vs 23.4 s.
    nbrs = oriented.groupBy("lo").agg(F.array_sort(F.collect_list("hi")).alias("ns"))
    na = nbrs.select(F.col("lo").alias("a"), F.col("ns").alias("ns_a"))
    nb = nbrs.select(F.col("lo").alias("b"), F.col("ns").alias("ns_b"))
    tri = (
        oriented.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        # inner joins are exact here: an endpoint missing from nbrs has
        # no out-neighbors, so its edges contribute zero triangles
        .join(na, "a")
        .join(nb, "b")
        .agg(
            F.coalesce(
                F.sum(F.size(F.array_intersect("ns_a", "ns_b"))), F.lit(0)
            ).alias("n_triangles")
        )
    )
    counts = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    verts = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.expr("(deg * (deg - 1)) div 2")).alias("n_wedges"),
    )
    out = (
        verts.crossJoin(counts)
        .crossJoin(tri)
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("clustering"),
        )
    )
    return _track(out, edges, oriented)


def bfs_hops(edges: DataFrame, seeds: DataFrame, max_hops: int = 4) -> DataFrame:
    """Minimum hop distance from a seed set, bounded by ``max_hops`` —
    the iterative-algorithm shape (frontier expansion + min-combine)
    with an exact, order-free result: (v, hop) for every vertex within
    ``max_hops`` of any seed.

    Each iteration is one join + one min-aggregation, both shuffling on
    the vertex key; the loop state is localCheckpoint'ed every
    generation so the plan stays O(1) deep (the d08 lesson: persist
    alone nests AQE subplans and the driver's plan rendering goes
    super-linear). ``max_hops`` iterations always suffice because hop
    values beyond the cap are discarded anyway.

    ``seeds`` is a one-column (v) DataFrame; ``edges`` the undirected
    (s < d) edge list.
    """
    # persisted for the loop: every generation joins against adj, and
    # without the persist each iteration re-derives the edge list from
    # the fact table. Safe to release before returning — the final dist
    # is an already-materialized checkpoint.
    adj = edges.select(F.col("s").alias("v"), F.col("d").alias("n")).unionAll(
        edges.select(F.col("d").alias("v"), F.col("s").alias("n"))
    ).persist()
    dist = seeds.select(F.col(seeds.columns[0]).alias("v"), F.lit(0).alias("hop"))
    dist = dist.localCheckpoint(eager=True)
    for i in range(1, max_hops + 1):
        # expand only the FRONTIER (vertices first reached last round):
        # a settled vertex's neighbors were already labeled when it was
        # discovered, so re-expanding it every generation would traverse
        # each edge once per remaining iteration instead of once overall
        frontier = dist.filter(F.col("hop") == i - 1)
        grown = frontier.join(adj, "v").select(F.col("n").alias("v"), F.lit(i).alias("hop"))
        dist = (
            dist.unionAll(grown)
            .groupBy("v")
            .agg(F.min("hop").alias("hop"))
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return dist.filter(F.col("hop") <= max_hops)


PR_SCALE = 10**12  # fixed-point rank unit


def pagerank_int(edges: DataFrame, iters: int = 5, damping_num: int = 17, damping_den: int = 20) -> DataFrame:
    """Deterministic fixed-point PageRank over an undirected (s < d)
    edge list: ranks are exact integers (unit = PR_SCALE) and every
    update is integer arithmetic — rank' = (1-d)*S + sum over neighbors
    of (d * rank) div deg — so the result is bit-identical on any
    engine, partitioning, or summation order (integer addition is
    associative; the div-truncation is part of the operator's defined
    semantics, d = damping_num/damping_den = 0.85).

    One join + one sum-aggregation per iteration, both shuffling on the
    vertex key; adjacency and degrees are persisted across the loop and
    the rank state is localCheckpoint'ed per generation (O(1) plan
    depth). Every vertex in an edge list has degree >= 1, so there are
    no dangling-mass corrections.
    """
    adj = edges.select(F.col("s").alias("v"), F.col("d").alias("n")).unionAll(
        edges.select(F.col("d").alias("v"), F.col("s").alias("n"))
    ).persist()
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg")).persist()
    base = PR_SCALE * (damping_den - damping_num) // damping_den
    rank = deg.select("v", F.lit(PR_SCALE).cast("long").alias("r")).localCheckpoint(eager=True)
    contrib = (
        F.expr(f"(({damping_num} * r) div {damping_den}) div deg")
    )
    for _ in range(iters):
        out = (
            rank.join(deg, "v")
            .join(adj, "v")
            .select(F.col("n").alias("v"), contrib.alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
            .select("v", (F.lit(base) + F.col("s")).cast("long").alias("r"))
        )
        rank = out.localCheckpoint(eager=True)
    adj.unpersist()
    deg.unpersist()
    return rank.select("v", "r")


def components_star(edges: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round algorithm: min-label propagation
    (dedup.neardup_components) needs O(diameter) rounds, which on a
    path-shaped graph is O(n); star contraction halves every path each
    round, so chains of any length converge in ~log2(n) iterations.

    large-star: every node u links its LARGER neighbors to
    m = min(N(u) ∪ {u}); small-star: every node links its smaller-or-
    equal neighborhood (plus itself) to its minimum. Both phases are a
    groupBy-min + join — two shuffles per round, localCheckpoint'ed
    per generation (see neardup_components' lineage-hygiene note).
    Returns (node, comp) for every node in the input edge set, comp =
    smallest reachable node id — identical output contract to
    neardup_components, so the two algorithms are interchangeable (and
    gate g04 pins them against the same recursive-SQL oracle)."""
    if max_iters < 1:
        # the convergence check lives inside the loop, so max_iters<=0
        # would raise "did not converge" even for an empty/trivial graph
        raise ValueError(f"components_star: max_iters must be >= 1, got {max_iters}")
    e = (
        edges.select(F.col("s").cast("long").alias("u"), F.col("d").cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # ---- large-star on the bidirected neighbor list
        nbrs = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", "u").alias("m"))
        )
        large = (
            nbrs.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star on the <=-oriented neighborhood (+ self)
        le = large.union(large.select(F.col("v").alias("u"), F.col("u").alias("v"))).filter(
            F.col("v") < F.col("u")
        )
        m2 = le.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            le.select("u", "v")
            .union(le.select("u", F.col("u").alias("v")).distinct())
            .join(m2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        converged = (
            small.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(small).limit(1).count() == 0
        )
        e = small
        if converged:
            break
    else:
        # Star contraction needs ~log2(max component size) rounds; a
        # silent exit here would return WRONG labels (partially
        # contracted forests), so the result contract demands a raise —
        # at 100 TB a path-like component of >2^max_iters nodes is
        # plausible, and the caller should retry with a larger budget.
        raise RuntimeError(
            f"components_star did not converge in max_iters={max_iters} "
            "rounds; the graph has a component larger than "
            f"~2^{max_iters} nodes — raise max_iters (rounds needed grow "
            "as log2 of the largest component size)"
        )
    # at the star fixed point every edge is (node, root); roots map to
    # themselves
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    )


def label_propagation(edges: DataFrame, iters: int = 2) -> DataFrame:
    """Synchronous majority label propagation (Raghavan et al. 2007) —
    community detection over a near-dup / co-occurrence graph, the
    soft-clustering companion to the hard connected components of
    :func:`components_star`.

    Semantics (fully deterministic): labels initialize to the node id;
    each round, every node adopts the most frequent label among its
    NEIGHBORS (its own label does not vote), ties broken by the
    smallest label; all nodes update simultaneously (synchronous), so
    the result after ``iters`` rounds is a pure function of the edge
    set — no visit order, no RNG.

    Scale: each round is one join of the undirected edge list against
    the label table (shuffle on node id, hash-uniform) + one
    partial-aggregated vote count + one per-node window on the already
    vote-partitioned key. O(iters) rounds of O(edges) work — the same
    budget as one components round, and unlike asynchronous LP it
    needs no vertex program or mutable state.
    """
    from pyspark.sql import Window

    s, d = edges.columns[0], edges.columns[1]
    # materialize the DIRECTED edge list once, BEFORE the undirected
    # union references it twice: when `edges` is an expensive subtree
    # (g05's near-dup candidate join) every further reference — the
    # union's two branches, the label init, each vote round — would
    # re-execute it (the sf10 smoke measured 93 s for what is a ~30 s
    # pair job plus trivial vote rounds)
    e = edges.select(F.col(s).alias("src"), F.col(d).alias("dst")).localCheckpoint()
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(iters):
        votes = (
            und.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("src").orderBy(F.desc("c"), F.asc("lbl"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "lbl")
        )
    # the localCheckpoint above drops edges' _readstat_cached chain —
    # re-attach it so callers can release the upstream persisted
    # intermediates (the near-dup inverted index in g05)
    return _track(labels.select("node", F.col("lbl").alias("label")), edges)
