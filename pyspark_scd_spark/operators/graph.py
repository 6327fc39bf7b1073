"""Iterative graph analytics over DataFrames: PageRank.

Companion to the min-label connected components in dedup.py — together
they cover the two iterative-graph shapes a data-pipeline engine needs
(component clustering for dedup, centrality for importance weighting /
sampling priors).

The reference has no iterative or graph operators of any kind
(reference jobs/create_employee_all.py — SURVEY.md §2b). PageRank here
is the standard synchronous power iteration expressed as a DataFrame
loop: each step is join(ranks, edges) -> groupBy(dst) -> sum, i.e. one
hash exchange per iteration on the edge destination. Scale notes:

- The degree-annotated edge list is built and cached ONCE; the loop
  never re-joins the degree table.
- Each iteration's ranks table is |nodes| rows — orders of magnitude
  smaller than |edges|. The rank-onto-edges join carries NO broadcast
  hint: AQE broadcasts it when it fits (one shuffle per iteration at
  small |nodes|) and falls back to a partitioned hash join with skew
  handling when |nodes| outgrows the threshold — a hinted broadcast
  would ship the full rank vector to every executor every iteration
  on a billion-node graph.
- ``localCheckpoint`` every few iterations truncates the growing
  lineage (a 20-iteration plan otherwise nests 20 joins deep and
  chokes the optimizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    edges_distinct: bool = False,
    edges_materialized: bool = False,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over an (src, dst) edge list.

    pr'(v) = (1-d)/N + d * sum over incoming edges (u,v) of
    pr(u)/outdeg(u). By default dangling mass is not redistributed
    (nodes without out-edges leak rank — standard simplified form).
    With ``redistribute_dangling=True`` the classic correction is
    applied: each iteration adds d * D/N to every node, where D is
    the summed rank of nodes with no out-edges, so total rank mass
    is conserved (sums to 1 every iteration). Cost: ONE extra global
    aggregate per iteration — a 1-row DataFrame over the (|nodes|-
    sized) rank table, attached via crossJoin exactly like the
    global_max_broadcast pattern (scd.py), never a driver collect:
    the scalar stays JVM-side and AQE turns the crossJoin into a
    broadcast of the single row.
    Returns (node, pr) for all nodes, unrounded.
    """
    # Materialize the canonical edge set ONCE: nodes, degrees, and the
    # first iteration each force this subtree, and an expensive
    # upstream generator (fact-table join + distinct) would otherwise
    # run three times before the loop even starts. Callers that
    # already guarantee distinct (src, dst) rows pass
    # ``edges_distinct=True`` to skip a redundant full-width shuffle;
    # callers whose input is already checkpointed (or a cheap map of a
    # checkpoint, e.g. a mirrored union) pass ``edges_materialized``
    # to skip a redundant second materialization job.
    edges = edges.select("src", "dst")
    if not edges_distinct:
        edges = edges.distinct()
    if not (edges_distinct and edges_materialized):
        edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("__outdeg")
    )
    # Attach out-degrees ONCE — the iteration loop then joins only
    # against the (|nodes|-sized, broadcastable) ranks table instead
    # of re-joining the degree table every pass.
    out_edges = edges.join(deg, "src").cache()
    n = nodes.count()
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    # The dangling node set is FIXED across iterations (out-degree
    # never changes), so build it once: nodes minus edge sources.
    # Left-anti on the (already cached) degree table — |nodes|-sized,
    # one exchange, reused every pass.
    dangling = None
    if redistribute_dangling:
        dangling = nodes.join(
            deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).cache()
    # No broadcast hints inside the loop: on a billion-node graph the
    # ranks/mass tables are |nodes|-sized, and an explicit broadcast
    # would ship the full rank vector to every executor every
    # iteration. Left unhinted, AQE picks broadcast when the table
    # actually fits (so small graphs keep the one-shuffle iteration)
    # and a partitioned hash join when it doesn't — same results,
    # scale-safe plan.
    sc = edges.sparkSession.sparkContext

    def _persistent_ids() -> set:
        try:
            jmap = sc._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}
        except Exception:
            return set()

    prev_cp_ids: set = set()

    def _tracked_checkpoint(df: DataFrame) -> DataFrame:
        # One mechanism for BOTH checkpoint sites (dangling-path head
        # and periodic tail) so every checkpointed block set is freed
        # once its successor materializes — previously the periodic
        # path bypassed tracking and its blocks accumulated for the
        # whole loop. eager=True is honest labeling, not extra cost:
        # under AQE a "lazy" localCheckpoint materializes its upstream
        # stages at plan-construction time anyway (NOTES.md item 9) —
        # and the materialization guarantee makes it safe to free the
        # PREVIOUS checkpoint's blocks (lineage is truncated onto the
        # new blocks).
        #
        # Concurrency guard: getPersistentRDDs is GLOBAL, so on a
        # SparkContext shared with concurrent jobs the before/after
        # diff can capture a FOREIGN RDD persisted in the window —
        # unpersisting someone else's localCheckpoint destroys its
        # only copy. A single localCheckpoint persists exactly one
        # RDD, so the diff is trusted only when |new| == 1; an
        # ambiguous diff forfeits cleanup for this round (degrades to
        # accumulate-until-GC, never corrupts). Relies on the private
        # _jsc API — absent under Spark Connect, where the except
        # path makes the whole mechanism a no-op.
        nonlocal prev_cp_ids
        before = _persistent_ids()
        df = df.localCheckpoint(eager=True)
        new_ids = _persistent_ids() - before
        if len(new_ids) != 1:
            prev_cp_ids = set()
            return df
        try:
            jmap = sc._jsc.getPersistentRDDs()
            for rid in prev_cp_ids:
                jrdd = jmap.get(rid)
                if jrdd is not None:
                    jrdd.unpersist(False)
        except Exception:
            # best-effort cleanup: on failure the loop degrades
            # to the old accumulate-until-GC behavior.
            pass
        prev_cp_ids = new_ids
        return df

    for i in range(iters):
        if dangling is not None:
            # The dangling aggregate references ranks a SECOND time
            # per iteration; unpinned, that doubles the rank subtree
            # per pass (2^iters growth). The checkpoint dedups both
            # references onto one block set.
            ranks = _tracked_checkpoint(ranks)
        mass = (
            out_edges.join(ranks, out_edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("__outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__mass"))
        )
        base = nodes.join(mass, "node", "left")
        if dangling is not None:
            # D = sum of current rank over dangling nodes: a 1-row
            # aggregate crossJoined onto the update (broadcast of one
            # row under AQE — the global_max_broadcast pattern), NOT
            # a collect: the loop stays a pure DataFrame program and
            # the scalar never round-trips through the driver.
            dmass = (
                ranks.join(dangling, "node", "semi")
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__dm"))
            )
            base = base.crossJoin(F.broadcast(dmass))
            extra = damping * F.col("__dm") / n
        else:
            extra = F.lit(0.0)
        ranks = base.select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + damping * F.coalesce(F.col("__mass"), F.lit(0.0))
                + extra
            ).alias("pr"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = _tracked_checkpoint(ranks)
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    set.

    Standard compact-forward join: edges are canonicalized to a < b
    and deduplicated, then a triangle (a,b,c) with a < b < c is found
    exactly once by joining e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c). The
    ordering constraint means every wedge is expanded from its
    lowest-id corner only, so the intermediate wedge set is bounded by
    sum(deg²) over HIGH-id neighbors — the classic mitigation for
    hub-node blowup. Two shuffle joins; the closing e3 probe is a join
    on both endpoints.

    Returns (node, triangles) for every node in at least one triangle.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    e2 = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    wedges = e.join(e2, F.col("b") == F.col("b2")).select("a", "b", "c")
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = wedges.join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    ).select("a", "b", "c")
    # explode, not a 3-way union: a union references the triangle
    # pipeline once per branch and re-executes the two joins three
    # times (measured: 40 exchanges / 18 scans in the union form, one
    # pipeline in this one).
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return per_node
