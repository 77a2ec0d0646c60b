"""Link-graph operators over the crawl's edge list.

A frontier crawl's second product (after the fetched corpus) is the edge
list (parent url -> child url). This module gives it the standard
authority analytics as pure DataFrame programs — no GraphX/GraphFrames
dependency, no RDDs, no UDFs.

Scale notes (the shapes that matter at 10^10 edges):
- every iteration of `pagerank_scores` is ONE src-keyed equi-join
  (edges x current scores) + ONE dst-keyed map-side-combinable sum —
  the aggregate-messages round Pregel/GraphX run. Persisting the edge
  list hash-partitioned by `src` makes the per-iteration join co-located
  (no edge shuffle after the first materialization).
- lineage is truncated with an EAGER localCheckpoint every
  `_CHECKPOINT_EVERY` iterations; lazy checkpoints race the
  ContextCleaner's accumulator teardown (the BENCH_r04 ERROR-spam bug)
  and unbounded lineage re-plans the whole chain each action.
- dangling nodes (outdeg 0) leak mass, the common web-scale
  simplification (full dangling redistribution needs a per-iteration
  global sum; callers that want it can add the scalar correction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CHECKPOINT_EVERY = 8


def node_degrees(edges: DataFrame) -> DataFrame:
    """Out/in degree + dangling flag per node of an (src, dst) edge list."""
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    o = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    i = edges.groupBy("dst").agg(F.count("*").alias("indeg"))
    return (
        nodes.join(o, nodes.node == o.src, "left")
        .join(i, nodes.node == i.dst, "left")
        .select(
            "node",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).alias("indeg"),
            F.when(F.coalesce("outdeg", F.lit(0)) == 0, 1)
            .otherwise(0)
            .alias("is_dangling"),
        )
    )


def pagerank_scores(
    edges: DataFrame, iters: int = 2, damping: float = 0.5
) -> DataFrame:
    """N-scaled PageRank over an (src, dst) edge list: pr0 = 1 for every
    node, pr_{k+1}(n) = (1-d) + d * sum_{s->n} pr_k(s)/outdeg(s).
    Returns (node, pr). Deterministic given the edge list; with iters=2
    the whole program is one-shot SQL-expressible (queries.q_pagerank's
    DuckDB oracle checks its values)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    out = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = edges.join(out, "src")  # (src, dst, outdeg)

    base = F.lit(1.0 - damping)
    pr = nodes.select("node", F.lit(1.0).alias("pr"))
    for k in range(iters):
        contrib = (
            ew.join(pr, ew.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("m"))
        )
        pr = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (base + F.lit(damping) * F.coalesce("m", F.lit(0.0))).alias("pr"),
        )
        if (k + 1) % _CHECKPOINT_EVERY == 0 and k + 1 < iters:
            pr = pr.localCheckpoint(eager=True)
    return pr
