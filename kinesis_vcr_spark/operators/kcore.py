"""k-core decomposition — iterative peeling, the graph-hygiene
operator that completes the graph family (components, PageRank, BFS,
triangles).

The k-core is the maximal subgraph in which every node has degree ≥ k
(Seidman 1983, public literature) — the standard "dense part of the
graph" primitive for spam/bot rings, community seeding, and pruning
near-dup graphs before expensive per-pair work. Peeling converges to
the unique fixpoint: repeatedly delete nodes of degree < k; what
survives is the k-core regardless of deletion order.

Spark shape (mirrors the iterative-family discipline of
operators/components.py and pagerank.py):

- the degree table is NODE-sized; the under-k set is smaller still and
  only ever SHRINKS, so both anti-joins broadcast it — the edge table
  never shuffles in any iteration;
- ``localCheckpoint`` per round truncates the iterative lineage;
- iteration count is the graph's peeling depth (≤ its degeneracy
  ordering rounds, typically ≪ node count); ``max_iterations`` is a
  loud-failure guard, which the oracle-paired query relies on — the
  DuckDB oracle unrolls exactly ``max_iterations`` peel steps, so a
  fixture that ever needed more would raise here rather than silently
  diverge.

Reference anchor: no counterpart in the reference (record/replay
tool); SURVEY.md §2.5a E-series (graph family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.triangles import _simple_undirected


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def kcore_edges(
    edges: DataFrame,
    src: str,
    dst: str,
    k: int,
    max_iterations: int = 50,
) -> DataFrame:
    """Edges ``(a, b)`` (canonical ``a < b``) of the k-core of the
    undirected simple graph. Raises after ``max_iterations`` peel
    rounds without convergence (see module docstring for why loud)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cur = _simple_undirected(edges, src, dst).localCheckpoint()
    for _ in range(max_iterations):
        bad = _degrees(cur).where(F.col("deg") < k).select("node")
        if bad.isEmpty():
            return cur
        cur = (
            cur.join(
                F.broadcast(bad.select(F.col("node").alias("a"))),
                "a",
                "left_anti",
            )
            .join(
                F.broadcast(bad.select(F.col("node").alias("b"))),
                "b",
                "left_anti",
            )
            .localCheckpoint()
        )
    # the guard must permit exactly max_iterations PEELS — without this
    # final check a graph converging on the last allowed peel would
    # raise even though the paired oracle's unroll (same depth) succeeds
    if _degrees(cur).where(F.col("deg") < k).isEmpty():
        return cur
    raise RuntimeError(
        f"{k}-core peeling did not converge within {max_iterations} "
        "iterations — raise max_iterations (and, for an oracle-paired "
        "query, the oracle's unroll depth with it)"
    )


def kcore_nodes(
    edges: DataFrame,
    src: str,
    dst: str,
    k: int,
    max_iterations: int = 50,
) -> DataFrame:
    """``(node, core_deg)`` for every node of the k-core — its degree
    WITHIN the core (≥ k by the fixpoint), the per-node output the
    audit queries want."""
    return _degrees(kcore_edges(edges, src, dst, k, max_iterations)).select(
        "node", F.col("deg").alias("core_deg")
    )
