"""Distributed graph analytics: triangles, communities, reachability.

Complements operators/retrieval.py's PageRank and operators/dedup.py's
connected components with the remaining classic graph primitives a
corpus-quality pipeline leans on: triangle/clustering statistics (link-
farm and spam-cluster detection), label-propagation communities (topic
or mirror-site grouping), and bounded-hop BFS (crawl-frontier distance,
contamination blast radius).

Scale design (the point of each algorithm's shape):

- ``triangle_stats`` uses the degree-ordered orientation of Suri &
  Vassilvitskii (WWW'11): every undirected edge points from its
  lower-(degree, id) endpoint to the higher one, so each triangle is
  counted exactly once AND the wedge join's fan-out per node is bounded
  by its oriented out-degree — O(m^1.5) work total regardless of skew
  (a celebrity node of degree 10M contributes almost no wedges because
  nearly all its edges point INTO it). No node ever materializes its
  full neighborhood.
- ``label_propagation`` is synchronous (deterministic) LPA: one
  hash join edges x labels + one count aggregation per round, label
  table is the only thing that moves between rounds. Ties break to the
  smallest label so results are bit-stable cross-engine.
- ``bfs_hops`` moves only the FRONTIER (newly settled nodes) through
  the join each round, not the full distance table; settled nodes
  drop out via left_anti, so total work is O(edges touched), the
  textbook distributed BFS.

All three take an ``edges`` DataFrame with ``src``/``dst`` long
columns. Undirected inputs should contain each edge once in either
direction for ``triangle_stats`` (it canonicalizes), and BOTH
directions for ``label_propagation``/``bfs_hops`` (neighbor semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges as (lo, hi), self-loops dropped."""
    return (edges
            .select(F.least("src", "dst").alias("lo"),
                    F.greatest("src", "dst").alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .distinct())


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle census: one row
    ``(n_nodes, n_edges, n_wedges, n_triangles, clustering_coeff)``.

    ``clustering_coeff`` is the global (transitivity) coefficient
    ``3 * triangles / wedges``, rounded to 6 places for cross-engine
    stability. Wedges are counted exactly from degrees
    (``sum deg*(deg-1)/2``) — no join needed for that term.
    """
    und = _canonical_undirected(edges)
    deg = (und.select(F.col("lo").alias("node"))
           .unionAll(und.select(F.col("hi").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))

    # orient each edge from the lower-(deg, id) endpoint to the higher
    dl = deg.select(F.col("node").alias("lo"), F.col("deg").alias("dlo"))
    dh = deg.select(F.col("node").alias("hi"), F.col("deg").alias("dhi"))
    keyed = (und.join(dl, "lo").join(dh, "hi")
             .select(
                 F.when((F.col("dlo") < F.col("dhi"))
                        | ((F.col("dlo") == F.col("dhi"))
                           & (F.col("lo") < F.col("hi"))),
                        F.col("lo")).otherwise(F.col("hi")).alias("a"),
                 F.when((F.col("dlo") < F.col("dhi"))
                        | ((F.col("dlo") == F.col("dhi"))
                           & (F.col("lo") < F.col("hi"))),
                        F.col("hi")).otherwise(F.col("lo")).alias("b")))

    # wedges at the LOW corner: (a->b, a->c) with b != c; each triangle
    # has exactly one low corner, so a semi-join of the open pair (b, c)
    # against the oriented edge set counts each triangle once
    e1 = keyed.select(F.col("a"), F.col("b").alias("x"))
    e2 = keyed.select(F.col("a"), F.col("b").alias("y"))
    open_pairs = (e1.join(e2, "a")
                  .filter(F.col("x") < F.col("y"))
                  .select("x", "y"))
    closed = (open_pairs.join(
        keyed.select(F.least("a", "b").alias("x"),
                     F.greatest("a", "b").alias("y")),
        ["x", "y"], "left_semi"))

    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("long").alias("n_wedges"))
    # both sides are 1-row aggregates: the crossJoin is a broadcast of
    # one row, keeping the whole census one lazy plan
    return stats.crossJoin(tri).select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        F.round(F.when(F.col("n_wedges") > 0,
                       3.0 * F.col("n_triangles") / F.col("n_wedges"))
                .otherwise(F.lit(0.0)), 6).alias("clustering_coeff"))


def label_propagation(edges: DataFrame, iterations: int = 3
                      ) -> DataFrame:
    """Synchronous label propagation: every node starts as its own
    label; each round it adopts the most frequent label among its
    neighbors, ties to the SMALLEST label (deterministic — the async
    variants of LPA are run-order dependent and untestable).

    ``edges`` must carry both directions of each undirected edge.
    Returns ``(node, label)``.

    Scale: per round exactly one shuffle join (edges x labels, labels
    are the small, shrinking-entropy side) and one two-level
    aggregation; the edge table itself is never re-shuffled when the
    caller pre-partitions it on ``src`` (same posture as
    retrieval.pagerank).
    """
    if iterations < 1:
        raise ValueError("label_propagation needs >= 1 iteration")
    # materialize the edge list once (lazily): every round joins it,
    # and without the checkpoint each round would recompute the whole
    # upstream lineage (same posture as retrieval.pagerank)
    edges = (edges.repartition("src")
             .localCheckpoint(eager=False))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionAll(edges.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=False))
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iterations):
        votes = (edges.join(labels.withColumnRenamed("node", "src"),
                            "src")
                 .groupBy(F.col("dst").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        best = (votes.groupBy("node")
                .agg(F.max(F.struct(F.col("cnt"),
                                    (-F.col("label")).alias("neg")))
                     .alias("top"))
                .select("node", (-F.col("top.neg")).alias("label")))
        # isolated nodes (no incoming votes) keep their current label
        labels = (nodes.join(best, "node", "left")
                  .join(labels.withColumnRenamed("label", "old"),
                        "node")
                  .select("node",
                          F.coalesce("label", "old").alias("label")))
    return labels


def bfs_hops(edges: DataFrame, source: int, max_hops: int = 4
             ) -> DataFrame:
    """Single-source bounded BFS: ``(node, hops)`` for every node
    reachable from ``source`` in at most ``max_hops`` edge traversals
    (directed — feed both directions for undirected semantics).

    Frontier-based: round k joins only the nodes first settled at
    distance k-1 against the edge table, anti-joins out already-settled
    nodes, and the settled set accumulates. Work is proportional to
    edges incident to the reached set, never |V| x rounds.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    spark = edges.sparkSession
    # every round probes the edge table; checkpoint it once (lazily)
    # so rounds reuse the materialized blocks instead of recomputing
    # the upstream lineage per hop
    if max_hops > 1:
        edges = (edges.repartition("src")
                 .localCheckpoint(eager=False))
    settled = spark.createDataFrame([(int(source), 0)],
                                    "node long, hops long")
    frontier = settled
    for k in range(1, max_hops + 1):
        nxt = (edges.join(frontier.withColumnRenamed("node", "src")
                          .select("src"), "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(settled.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(k)))
        if k < max_hops:
            # lazily checkpoint the frontier (it feeds both the union
            # and the next round's join — blocks are shared once
            # computed) and stop early when empty: take(1) probes
            # partitions incrementally, so an early hit costs O(1) and
            # the remainder materializes inside the next round's job
            # instead of a dedicated warm-up job per hop (r12)
            nxt = nxt.localCheckpoint(eager=False)
            frontier = nxt
            settled = settled.unionAll(frontier)
            if not nxt.take(1):
                break
        else:
            frontier = nxt
            settled = settled.unionAll(frontier)
    return settled


def kcore(edges: DataFrame, k: int = 2, max_rounds: int = 50,
          src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    nodes of (undirected) degree < k until fixpoint; returns the
    surviving ``(node, degree)`` with degrees measured INSIDE the
    core. The standard graph-based quality screen — nodes outside a
    2-/3-core are weakly connected (drive-by links, spam tails) and
    the max-core is the densely-interacting region worth keeping.

    Scale shape: each round is one partial-aggregated degree count +
    two semi-joins that shrink the (lo, hi) edge list; the round's
    result is LAZILY checkpointed and the fixpoint-test count is the
    action that materializes it — one job per round, not a
    materialize-then-count pair (r12; the connected_components
    pattern). Peeling converges in at most O(peeled layers) rounds —
    typically a handful — and EXTRA rounds are no-ops, which is what
    makes the unrolled-SQL oracle (`graph_kcore`) exact: both engines
    land on the same fixpoint regardless of round count.
    """
    und = _canonical_undirected(
        edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")))
    und = und.localCheckpoint(eager=False)
    prev_edges = und.count()
    for _ in range(max_rounds):
        deg = (und.select(F.col("lo").alias("node"))
               .unionAll(und.select(F.col("hi").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
        keep = deg.filter(F.col("degree") >= k).select("node")
        und = (und
               .join(keep.withColumnRenamed("node", "lo"), "lo",
                     "left_semi")
               .join(keep.withColumnRenamed("node", "hi"), "hi",
                     "left_semi")
               .localCheckpoint(eager=False))
        n = und.count()
        if n == prev_edges:
            break
        prev_edges = n
    return (und.select(F.col("lo").alias("node"))
            .unionAll(und.select(F.col("hi").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))


def deterministic_walks(edges: DataFrame, length: int = 4,
                        seed: int = 42, src_col: str = "src",
                        dst_col: str = "dst") -> DataFrame:
    """Fixed-length walk per node over the undirected graph — the
    corpus generator behind DeepWalk/node2vec-style graph embeddings.
    Each step moves to the neighbor minimizing the seeded portable
    hash ``md5("{seed}:{step}:{cur}:{neighbor}")`` (ties to the
    smaller neighbor id): "random" enough to decorrelate walks, yet
    fully DETERMINISTIC — any engine regenerates the identical corpus
    (the DuckDB twin `graph_walk_corpus` is oracle-exact, unusual for
    a sampling operator). Returns ``(start, step, node)`` with step 0
    = the start node.

    Scale shape (r12): the hash-argmin next step is a pure function of
    ``(step, cur)`` — it never depends on the walk's start — so the
    per-step successor table is computed ONCE from the adjacency list
    (one explode over ``length`` step ids + one map-side-combinable
    min(struct) aggregation, O(length * |E|) rows through a single
    exchange) and the walks then compose ``length`` node-scale
    (start, cur) x (cur -> nxt) joins. The pre-r12 form joined the
    full edge list against the walk table every round — edge-scale
    work per step, with hash-min fan-in hotspots when many walks
    converge on one hub node; the successor-table form does the
    per-neighbor work exactly once per (step, node). The walk
    composition itself is ONE lazy plan (r13): ``length`` chained
    joins against the checkpointed successor table accumulate the
    visited nodes as columns — at most ``length + 1`` longs per row,
    bounded by the walk length — and a single posexplode emits
    (step, node); no per-step materialization, no (length+1)-branch
    union.
    """
    und = _canonical_undirected(
        edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")))
    # spread the adjacency across the cluster BEFORE the successor
    # aggregation: the seeded-md5 argmin below evaluates an md5 per
    # (step, cur, nxt) on the map side of fn's exchange, and AQE's
    # coalescing parks the small checkpointed union on a handful of
    # partitions (r13 profile: one 2.8 s stage on 4 tasks at 32
    # cores). A keyed repartition (no round-robin pre-sort) pinned to
    # defaultParallelism is scale-adaptive: ~1/length of the exchange
    # the aggregation already pays, and it parallelizes the md5 work.
    par = edges.sparkSession.sparkContext.defaultParallelism
    adj = (und.select(F.col("lo").alias("cur"),
                      F.col("hi").alias("nxt"))
           .unionAll(und.select(F.col("hi").alias("cur"),
                                F.col("lo").alias("nxt")))
           .repartition(par, "cur")
           .localCheckpoint(eager=False))
    seeded = F.concat(F.lit(f"{seed}:"), F.col("step").cast("string"),
                      F.lit(":"), F.col("cur").cast("string"),
                      F.lit(":"), F.col("nxt").cast("string"))
    h = F.conv(F.substring(F.md5(seeded), 1, 13), 16, 10) \
        .cast("long")
    # (step, cur) -> next node, all steps in one aggregation; the
    # min(struct(h, nxt)) tie-break is exactly the per-walk argmin the
    # join form computed, so results are identical
    fn = (adj.select(
            F.explode(F.sequence(F.lit(1), F.lit(length)))
            .alias("step"), "cur", "nxt")
          .groupBy("step", "cur")
          .agg(F.min(F.struct(h.alias("h"),
                              F.col("nxt").alias("n"))).alias("m"))
          .select("step", "cur", F.col("m.n").alias("nxt"))
          .localCheckpoint(eager=False))
    # compose the walk as ONE plan: length chained (node-scale) joins
    # against the checkpointed successor table accumulate the visited
    # nodes as COLUMNS, and a single posexplode emits (step, node) —
    # no per-step localCheckpoint, no (length+1)-branch union. The
    # prior per-step form materialized each step and unioned L+1
    # branches, costing per-step scheduling that dominated at bench SF
    # (r13, guide §2.4/§7). Every node has a successor at every step
    # (the adjacency is symmetric and fn covers steps 1..length for
    # every node with a neighbor), so the inner joins drop nothing and
    # the emitted rows are identical to the per-step form's.
    walk = adj.select(F.col("cur").alias("n0")).distinct()
    for step in range(1, length + 1):
        fk = (fn.filter(F.col("step") == step)
              .select(F.col("cur").alias(f"__k{step}"),
                      F.col("nxt").alias(f"n{step}")))
        walk = (walk.join(fk, F.col(f"n{step - 1}")
                          == F.col(f"__k{step}"))
                .drop(f"__k{step}"))
    return walk.select(
        F.col("n0").alias("start"),
        F.posexplode(F.array(*[F.col(f"n{k}")
                               for k in range(length + 1)]))
        .alias("step", "node"))
