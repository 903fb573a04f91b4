"""Distributed connected components — the clustering step of a near-dup
pipeline.

LSH (MinHash / SimHash / embedding buckets) emits *pairs*; a real dedup
run then groups documents into duplicate CLUSTERS and keeps one
representative per cluster. That grouping is connected components over
the pair graph. Beyond-reference surface (the reference has no graph
operator); re-expressed Spark-first as iterative hash-min label
propagation:

- every node starts labeled with itself;
- each round, a node's label becomes the min of its own and its
  neighbors' labels (one shuffle join + one map-side-combinable min-agg);
- converged when no label changes — detected with one tiny ``sum(lbl)``
  aggregate per round (labels only ever decrease, so the sum is strictly
  monotone until fixpoint).

Scale shape: rounds needed = graph diameter. Near-dup clusters are
dense and shallow (copies of one document all pair with each other), so
2-3 rounds close them; the ``max_iter`` guard bounds pathological
chains. Each round shuffles only (node, lbl) longs — never text — and
``localCheckpoint``s its frame, so both LINEAGE (plan size, stage
count) and storage stay O(1) in rounds instead of growing with each
iteration; superseded rounds' blocks are reclaimed by the
ContextCleaner as their references are dropped. For adversarial long-chain graphs the
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond") halves diameter per round; hash-min is the right
default for dedup workloads and keeps every step an oracle-expressible
relational op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 25) -> DataFrame:
    """Cluster assignment for every node appearing in ``pairs``.

    Returns (node, cluster_id) where ``cluster_id`` is the minimum node
    id in the node's connected component — deterministic under any
    partitioning. Raises if ``max_iter`` rounds don't converge (a
    correctness guard: a silent early stop would split clusters).
    """
    edges = pairs.select(F.col(src).cast("long").alias("u"),
                         F.col(dst).cast("long").alias("v"))
    # Undirected: propagate both ways. localCheckpoint (not persist):
    # beyond caching, it TRUNCATES lineage, so each round's join plan
    # references a flat scan of (u, v) longs instead of replaying the
    # upstream candidate generator (e.g. the full MinHash banding plan) —
    # without this, plan size and stage count grow with every round
    # (observed: 22 stacked broadcast joins in prep_pipeline's audit).
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)

    # Fused init + first propagation round: every node's label starts as
    # min(self, direct neighbors) — one combinable agg instead of a
    # distinct + a join round. Dense near-dup cliques are already
    # converged here; the loop then just confirms the fixpoint.
    labels = (edges.groupBy(F.col("u").alias("node"))
              .agg(F.least(F.first("u"), F.min("v")).alias("lbl"))
              .localCheckpoint(eager=False))
    # Convergence checksum in DECIMAL(38,0): labels only ever decrease,
    # so equal sums ⇔ fixpoint — and a long sum of 64-bit ids over a
    # trillion-node graph would overflow (ANSI mode errors); decimal
    # gives 38 digits of headroom at the same one-row cost.
    _chk = F.sum(F.col("lbl").cast("decimal(38,0)"))
    prev_sum = labels.agg(_chk).first()[0]

    converged = False
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges.v == labels.node)
                   .groupBy(F.col("u").alias("node"))
                   .agg(F.min("lbl").alias("nbr_lbl")))
        # Lazy checkpoint: the checksum action right below materializes
        # it, so each round stays ONE job while the new label frame's
        # lineage is cut to a flat (node, lbl) scan. Prior rounds'
        # checkpoint blocks are reclaimed by the ContextCleaner as the
        # dropped Python/JVM references are garbage-collected — no
        # caller-side unpersist contract (bounded by max_iter regardless).
        new_labels = (labels.alias("l")
                      .join(nbr_min.alias("n"), "node", "left")
                      .select("node",
                              F.least(F.col("l.lbl"),
                                      F.coalesce(F.col("n.nbr_lbl"),
                                                 F.col("l.lbl"))).alias("lbl"))
                      .localCheckpoint(eager=False))
        cur_sum = new_labels.agg(_chk).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum

    if not converged:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds "
            "(graph diameter exceeds the guard; raise max_iter)")
    # The returned frame is locally checkpointed: downstream consumers
    # read the materialized (node, lbl) blocks instead of replaying the
    # iterative lineage, and — unlike the old persist() contract — there
    # is nothing for the caller to unpersist; storage is reclaimed once
    # the frame is unreferenced.
    return labels.select("node", F.col("lbl").alias("cluster_id"))


def connected_components_star(pairs: DataFrame, src: str = "doc_a",
                              dst: str = "doc_b",
                              max_iter: int = 25) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the adversarial-graph gear behind
    :func:`connected_components`.

    Hash-min propagates the minimum one HOP per round, so a path graph
    of diameter d needs d rounds; the star rounds rewire edges toward
    local minima and contract long chains in O(log² n) rounds. Near-dup
    graphs are shallow (hash-min's 2-3 rounds beat the star rounds'
    extra distinct shuffle per phase), which is why hash-min stays the
    default and this variant is opt-in for long-chain workloads.

    Phases over a canonical (a < b) edge list:

    - LARGE-STAR: per node u (bidirectional view), m = min(u ∪ N(u));
      every strictly-larger neighbor v > u re-attaches as (m, v).
    - SMALL-STAR: per larger-endpoint u, m = min of its smaller
      neighbors; u and each smaller neighbor v ≠ m re-attach to m.

    Both phases only ever connect nodes already in one component, and
    the per-node minimum reachable neighbor is non-increasing, so the
    Σ-label checksum stalls only at candidate fixpoints. A stall is
    VERIFIED before returning: the label map must be constant across
    every ORIGINAL edge (the defining property of a component
    assignment — label chains stay in-component and lbl(x) ≤ x, so a
    verified map labels every component by its minimum id, exactly the
    :func:`connected_components` contract). An unverified stall keeps
    iterating; ``max_iter`` guards pathological cases loudly.
    """
    orig = (pairs.select(F.col(src).cast("long").alias("u"),
                         F.col(dst).cast("long").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .localCheckpoint(eager=False))
    edges = (orig.select(F.least("u", "v").alias("a"),
                         F.greatest("u", "v").alias("b"))
                 .distinct().localCheckpoint(eager=False))

    def _bid(e: DataFrame) -> DataFrame:
        return e.select(F.col("a").alias("x"), F.col("b").alias("y")).union(
            e.select(F.col("b").alias("x"), F.col("a").alias("y")))

    def _labels(e: DataFrame) -> DataFrame:
        return (_bid(e).groupBy(F.col("x").alias("node"))
                .agg(F.least(F.first("x"), F.min("y")).alias("lbl")))

    _chk = F.sum(F.col("lbl").cast("decimal(38,0)"))
    prev_sum = _labels(edges).agg(_chk).first()[0]

    for _ in range(max_iter):
        # Large-star: strictly-larger neighbors attach to the local min.
        bid = _bid(edges)
        mins = (bid.groupBy(F.col("x").alias("u"))
                   .agg(F.least(F.first("x"), F.min("y")).alias("m")))
        ls = (bid.join(mins, bid.x == mins.u)
                 .where(F.col("y") > F.col("x"))
                 .select(F.col("m").alias("a"), F.col("y").alias("b"))
                 .where(F.col("a") != F.col("b"))
                 .distinct())
        # Small-star: the larger endpoint and its smaller neighbors
        # attach to the minimum smaller neighbor.
        smins = (ls.groupBy(F.col("b").alias("u"))
                   .agg(F.min("a").alias("m")))
        ss = (ls.join(smins, ls.b == smins.u)
                .select(F.col("m").alias("a"), F.col("a").alias("b"))
                .where(F.col("a") != F.col("b"))
                .union(smins.select(F.col("m").alias("a"),
                                    F.col("u").alias("b")))
                .distinct()
                .localCheckpoint(eager=False))
        labels = _labels(ss)
        cur_sum = labels.agg(_chk).first()[0]
        edges = ss
        if cur_sum == prev_sum:
            lu = labels.select(F.col("node").alias("u"),
                               F.col("lbl").alias("lu"))
            lv = labels.select(F.col("node").alias("v"),
                               F.col("lbl").alias("lv"))
            bad = (orig.join(lu, "u").join(lv, "v")
                       .where(F.col("lu") != F.col("lv")).limit(1).count())
            if bad == 0:
                return (labels.localCheckpoint(eager=True)
                        .select("node", F.col("lbl").alias("cluster_id")))
        prev_sum = cur_sum

    raise RuntimeError(
        f"connected_components_star: no verified convergence in "
        f"{max_iter} rounds")


def cluster_assignment(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id", src: str = "doc_a",
                       dst: str = "doc_b", algo: str = "hashmin") -> DataFrame:
    """Full-corpus cluster ids: every document gets a cluster (docs in no
    pair are their own singleton cluster), plus the cluster's size.

    One broadcast-sized join back to the corpus (the component table is
    |nodes-in-pairs| rows — tiny relative to the corpus, so Catalyst/AQE
    broadcasts it), then ONE shuffle on cluster_id for the size — a
    window count, not a groupBy + self-join, so the corpus is scanned
    once. The component table arrives locally checkpointed, so repeated
    invocations leave no caller-owned cache entries behind.

    ``algo`` selects the component machinery: ``"hashmin"`` (default —
    right for shallow near-dup graphs) or ``"star"``
    (:func:`connected_components_star`, for adversarial long-chain
    graphs). Both return identical assignments by contract.
    """
    from pyspark.sql import Window
    if algo == "hashmin":
        comp = connected_components(pairs, src=src, dst=dst)
    elif algo == "star":
        comp = connected_components_star(pairs, src=src, dst=dst)
    else:
        raise ValueError(f"unknown components algo: {algo!r}")
    assigned = (docs.select(F.col(id_col).cast("long").alias(id_col))
                .join(comp.withColumnRenamed("node", id_col), id_col, "left")
                .select(id_col,
                        F.coalesce("cluster_id", F.col(id_col))
                         .alias("cluster_id")))
    w = Window.partitionBy("cluster_id")
    return assigned.select(id_col, "cluster_id",
                           F.count(F.lit(1)).over(w).alias("cluster_size"))


def triangle_stats(pairs: DataFrame, src: str = "doc_a",
                   dst: str = "doc_b") -> DataFrame:
    """Global triangle census of an undirected edge list (edges
    canonical ``src < dst``): node/edge counts, open-wedge count
    (Σ deg·(deg−1)/2), triangle count, and the global clustering
    coefficient 3·triangles / wedges — the dup-graph QA signal that
    distinguishes tight cliques (copy farms, mirrored sites) from
    chains of borderline matches that CC alone can't tell apart.

    Triangle enumeration is the canonical two-join pattern over the
    ordered edge list: e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) with a<b<c, so each
    triangle is counted exactly once and the join fan-out is bounded by
    Σ_edges deg — fine for a verified near-dup graph (edges ≪ corpus).
    At web scale you'd pre-bucket by degree (node-iterator++); the plan
    shape per bucket is identical.
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # The edge list feeds SIX consumers (degree union ×2, the three-way
    # self-join, the edge count); without materialization the caller's
    # whole pair-generation lineage re-executes per consumer (5.2s → sub-
    # second for the LSH-derived census at sf0.1). Edge lists here are
    # verified near-dup pairs — tiny relative to the corpus by design.
    e = e.localCheckpoint(eager=True)
    deg = (e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    base = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum((deg * (deg - 1)) div 2)").alias("n_wedges"))
    ecnt = e.agg(F.count(F.lit(1)).alias("n_edges"))
    tri = (e.alias("e1")
            .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
            .join(e.alias("e3"),
                  (F.col("e3.a") == F.col("e1.a"))
                  & (F.col("e3.b") == F.col("e2.b")))
            .agg(F.count(F.lit(1)).alias("n_triangles")))
    return (base.crossJoin(ecnt).crossJoin(tri)
            .select("n_nodes", "n_edges", "n_wedges", "n_triangles",
                    F.when(F.col("n_wedges") > 0,
                           (F.col("n_triangles") * 3).cast("double")
                           / F.col("n_wedges").cast("double"))
                     .otherwise(F.lit(0.0)).alias("global_clustering")))


def pagerank_fixed_point(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", n_rounds: int = 5,
                         damping_pct: int = 85,
                         scale: int = 10 ** 12) -> DataFrame:
    """PageRank over an undirected edge list in FIXED-POINT integer
    arithmetic — the centrality signal that ranks a near-dup component's
    "canonical" document (the node the most duplicates point at), and
    the classic iterative-dataflow benchmark re-expressed Spark-first.

    Everything is BIGINT micro-units (``scale`` units = rank mass 1.0):

    - init   r₀ = scale div n                 (n = node count)
    - round  rᵥ' = teleport + (damping_pct · Σ_{u→v} (rᵤ div degᵤ)) div 100
      with   teleport = ((scale div n) · (100 − damping_pct)) div 100

    Integer division and BIGINT sums are exact and order-independent,
    so the result is bit-identical under ANY partitioning and in any
    engine that implements integer div the same way (Spark ``div``,
    DuckDB ``//``) — unlike float PageRank, whose non-associative sums
    make cross-engine hashes flap. The quantization error is ≤ deg·1
    unit per node per round — 1e-12-scale noise, irrelevant for ranking.

    Scale shape: each round is ONE shuffle join (edges ⋈ ranks on the
    source node) + one combinable BIGINT sum — the canonical Pregel
    message-passing step as relational ops. Edges and per-round ranks
    are ``localCheckpoint``-ed so lineage/plan size stay O(1) in rounds
    (same discipline as :func:`connected_components`). The only driver
    value is the node count (one scalar). Overflow headroom: ranks are
    bounded by the total mass ``scale`` = 1e12, and the pre-division
    product is ≤ 85·scale ≪ 2⁶³. Undirected graphs have no dangling
    nodes (every node has deg ≥ 1), so no lost-mass correction term.
    """
    edges = pairs.select(F.col(src).cast("long").alias("u"),
                         F.col(dst).cast("long").alias("v"))
    edges = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    deg = (edges.groupBy(F.col("u").alias("node"))
                .agg(F.count(F.lit(1)).alias("deg"))
                .localCheckpoint(eager=True))
    n = deg.count()
    if n == 0:
        return deg.select("node", "deg",
                          F.lit(0).cast("long").alias("pr_units"),
                          F.lit(0.0).alias("pagerank"))
    init = scale // n
    teleport = (init * (100 - damping_pct)) // 100
    ranks = deg.select("node", "deg", F.lit(init).cast("long").alias("r"))
    for _ in range(n_rounds):
        incoming = (edges.join(ranks, edges.u == ranks.node)
                         .select(F.col("v").alias("node"),
                                 F.expr("r div deg").alias("c"))
                         .groupBy("node")
                         .agg(F.sum("c").alias("s")))
        ranks = (deg.join(incoming, "node", "left")
                    .select("node", "deg",
                            (F.lit(teleport).cast("long")
                             + F.expr(f"({damping_pct} * coalesce(s, 0L)) "
                                      "div 100")).alias("r"))
                    .localCheckpoint(eager=False))
    return ranks.select("node", "deg", F.col("r").alias("pr_units"),
                        (F.col("r").cast("double")
                         / F.lit(float(scale))).alias("pagerank"))
