"""crabspark.graph: the iterative PageRank fixpoint the oracled
2-iteration query (queries.q_pagerank) is one unrolling of, plus degree
invariants."""

import pyspark.sql.functions as F
import pytest

from crabspark import queries as Q
from crabspark.graph import node_degrees, pagerank_scores
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def edges(spark):
    return Q._edges(spark, SF_DIR).cache()


def test_degree_sums_equal_edge_count(spark, edges):
    d = node_degrees(edges).agg(
        F.sum("outdeg").alias("o"), F.sum("indeg").alias("i")
    ).first()
    n_edges = edges.count()
    assert d["o"] == n_edges
    assert d["i"] == n_edges


def test_pagerank_converges_and_is_bounded(spark, edges):
    """Damping 0.5 contracts the iteration by >= 2x per round; crossing
    the localCheckpoint boundary (iters 9 vs 10, _CHECKPOINT_EVERY=8)
    must not perturb values."""
    a = pagerank_scores(edges, iters=9).withColumnRenamed("pr", "pr_a")
    b = pagerank_scores(edges, iters=10).withColumnRenamed("pr", "pr_b")
    j = a.join(b, "node")
    row = j.agg(
        F.max(F.abs(F.col("pr_a") - F.col("pr_b"))).alias("delta"),
        F.min("pr_b").alias("lo"),
        F.max("pr_b").alias("hi"),
        F.count("*").alias("n"),
    ).first()
    assert row["n"] == node_degrees(edges).count()
    # geometric contraction: |pr_10 - pr_9| <= 0.5^9 * O(1)
    assert row["delta"] < 1e-2, row["delta"]
    # (1-d) floor for no-inlink nodes; finite ceiling
    assert row["lo"] >= 0.5 - 1e-12
    assert row["hi"] < 100.0


def test_unrolled_query_is_two_iterations(spark, edges):
    """q_pagerank (the DuckDB-oracled unrolling of the LEAK variant)
    == pagerank_scores(iters=2, dangling='leak'), and
    q_pagerank_redistributed == the redistribute fixpoint."""
    unrolled = Q.q_pagerank(spark, SF_DIR)
    loop = pagerank_scores(edges, iters=2, dangling="leak").select(
        "node", F.round("pr", 4).alias("pagerank")
    )
    assert unrolled.exceptAll(loop).count() == 0
    assert loop.exceptAll(unrolled).count() == 0
    unrolled_r = Q.q_pagerank_redistributed(spark, SF_DIR)
    loop_r = pagerank_scores(edges, iters=2, dangling="redistribute").select(
        "node", F.round("pr", 4).alias("pagerank")
    )
    assert unrolled_r.exceptAll(loop_r).count() == 0
    assert loop_r.exceptAll(unrolled_r).count() == 0


def test_pagerank_redistribution_conserves_mass(spark, edges):
    """The round-5 judge directive: with dangling='redistribute' (the
    default), sum(pr) == N at EVERY iteration — no dangling leak. The
    leak variant, by contrast, must actually decay on this graph (the
    fixture has dangling nodes, so the invariant test is non-vacuous)."""
    n = (
        edges.selectExpr("src AS node")
        .union(edges.selectExpr("dst AS node"))
        .distinct()
        .count()
    )
    n_dangling = node_degrees(edges).filter("is_dangling = 1").count()
    assert n_dangling > 0, "fixture has no dangling nodes — test is vacuous"
    for iters in (1, 2, 3, 5):
        total = (
            pagerank_scores(edges, iters=iters).agg(F.sum("pr")).first()[0]
        )
        assert abs(total - n) < 1e-6 * n, (iters, total, n)
    leaked = (
        pagerank_scores(edges, iters=3, dangling="leak")
        .agg(F.sum("pr"))
        .first()[0]
    )
    assert leaked < n - 1e-9, (leaked, n)


def test_hits_mean_one_and_star_graph(spark):
    """On a star graph (hub 0 -> authorities 1..4, plus a reverse edge
    5 -> 0), node 0 must be the top hub and nodes 1-4 the top
    authorities; every half-step is mean-1 normalized so each score
    column must sum to the node count."""
    from crabspark.graph import hits_scores

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (5, 0)], ["src", "dst"]
    )
    h = hits_scores(e, iters=3).toPandas().set_index("node").sort_index()
    n = len(h)
    assert abs(h.auth.sum() - n) < 1e-9
    assert abs(h.hub.sum() - n) < 1e-9
    assert h.hub.idxmax() == 0
    assert set(h.auth.nlargest(4).index) == {1, 2, 3, 4}
    assert h.loc[5, "auth"] == 0.0  # nothing links to 5


def test_host_graph_accounts_every_edge(spark, edges):
    """Host-graph link counts must partition the edge list exactly, and
    internal edges (src_host == dst_host) must carry is_internal=1."""
    from crabspark.graph import host_graph

    hg = host_graph(edges, host_of="NODE % 20").toPandas()
    assert hg.n_links.sum() == edges.count()
    internal = hg[hg.src_host == hg.dst_host]
    assert (internal.is_internal == 1).all()
    assert (hg[hg.src_host != hg.dst_host].is_internal == 0).all()
    assert (hg.n_src_pages <= hg.n_links).all()
