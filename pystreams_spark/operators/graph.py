"""Iterative graph dataflow beyond connected components: PageRank
(Brin & Page 1998 — public) over an edge DataFrame, the canonical
"loop of joins" workload (the original Pregel/GraphX motivating
example).

Scale shape per iteration: ONE join (ranks ⋈ out-degree-weighted
edges) + ONE groupBy(dst) sum — both hash-partitioned on the node key,
so with a stable partitioning the shuffles line up run-to-run and AQE
coalesces them. The rank frame is localCheckpoint'ed each iteration:
without it, iteration k's plan would replay all k-1 previous joins
(the classic iterative-lineage blowup). Dangling nodes (no out-edges)
redistribute their mass uniformly — the standard stochastic-matrix
completion — via a 1-row aggregate broadcast, not a driver collect.

Adaptive physical strategy, mirroring ``dedup.cc_keep_min``: the
near-dup graphs this exists for are orders of magnitude smaller than
the corpus, so a ``small_graph_edges`` cutover (default 2M) runs the
whole power iteration as ONE executor task (numpy, sparse contribution
scatter — no per-iteration job overhead); above it, the distributed
join loop takes over. Both paths compute the identical recurrence.

Convergence is fixed-iteration (like GraphX's default), keeping the
result deterministic and partitioning-independent up to float-sum
order; the differential test matches a dense numpy power iteration to
1e-9 on both physical paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import materialize

__all__ = ["pagerank", "triangle_census"]


def _pagerank_one_task(
    e: DataFrame, num_iters: int, damping: float
) -> DataFrame:
    """Whole power iteration in one executor task (small graphs): the
    same recurrence as the distributed loop, numpy-vectorized."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        srcs, dsts = [], []
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy(dtype=np.int64))
            dsts.append(pdf["dst"].to_numpy(dtype=np.int64))
        if not srcs:
            return
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        s_idx, d_idx = inv[: len(src)], inv[len(src):]
        m = len(ids)
        deg = np.bincount(s_idx, minlength=m).astype(np.float64)
        dangling = deg == 0.0
        w = 1.0 / deg[s_idx]
        r = np.full(m, 1.0 / m)
        base = (1.0 - damping) / m
        for _ in range(num_iters):
            contrib = np.zeros(m)
            np.add.at(contrib, d_idx, r[s_idx] * w)
            r = base + damping * (contrib + r[dangling].sum() / m)
        yield pd.DataFrame({"node": ids, "rank": r})

    return e.coalesce(1).mapInPandas(kernel, "node long, rank double")


def pagerank(
    edges: DataFrame,
    num_iters: int = 15,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_to: int = 8,
    small_graph_edges: int = 2_000_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over directed ``edges``; returns (node, rank) with
    Σrank = 1. Nodes = every id appearing as src OR dst.

    ``checkpoint_dir``: reliable-checkpoint the per-iteration rank
    frame (and the reused edge/node frames) into a cluster-visible
    directory instead of executor-pinned localCheckpoint — see
    ``io.materialize`` for the fault-tolerance tradeoff."""
    for c in (src_col, dst_col):
        t = dict(edges.dtypes)[c]
        if t not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"pagerank: node ids must be integral (column {c!r} is {t}) — "
                "both physical paths contract on int64 node ids; map string "
                "ids through a dictionary first"
            )
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
    )
    # lazy: n_edges' count materializes the pin — one barrier, not two
    e = materialize(e, checkpoint_dir, eager=False)
    n_edges = e.count()
    if n_edges == 0:
        raise ValueError("pagerank: empty graph")
    if n_edges <= small_graph_edges:
        out = _pagerank_one_task(e, num_iters, damping)
        return out.select("node", F.round("rank", round_to).alias("rank"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = materialize(nodes, checkpoint_dir, eager=False)
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty graph")

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    # contribution edges with 1/deg weight, reused every iteration
    w_edges = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("_w"))
    )
    w_edges = materialize(w_edges, checkpoint_dir)

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(num_iters):
        contribs = (
            w_edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_w")).alias("_in"))
        )
        # dangling mass: rank held by nodes with no out-edges, spread
        # uniformly (1-row aggregate, broadcast by crossJoin)
        dangling = (
            ranks.join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dm") / n_nodes)
                ).alias("rank"),
            )
        )
        ranks = materialize(ranks, checkpoint_dir)
    return ranks.select("node", F.round("rank", round_to).alias("rank"))


def triangle_census(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    round_to: int = 6,
) -> DataFrame:
    """Triangle count + global clustering coefficient of an undirected
    graph given as ordered edges (src < dst, one row per edge) — the
    cohesion probe for a duplicate graph: high clustering means dup
    clusters are near-cliques (a clean threshold); low clustering with
    many edges means chains of borderline pairs (threshold too loose).

    Output: ONE row (n_nodes, n_edges, n_triangles, n_wedges,
    clustering = 3·T / wedges; NULL when the graph has no wedge).

    Scale shape — the standard ordered-edge triangle join: each
    triangle u<v<w is found exactly once by joining (u,v)+(v,w) and
    probing (u,w), so the join bill is Σ deg(v)² over MIDDLE vertices
    (the wedge count), not |V|³; for skewed graphs the classic
    refinement is degree-ordering the edges first, which this ordered
    form already approximates. Wedges come from one degree aggregate.
    The edge frame is materialized once for its four consumers."""
    e = (
        edges.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("v")
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        # lazy: the final action's first edge consumer materializes it
        .localCheckpoint(eager=False)
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"], "left_semi")
    # triangle count stays IN the plan as a 1-row frame (r12): a
    # driver-side tri.count() was a serial barrier between the triangle
    # join and the degree aggregate — crossJoining the two 1-row aggs
    # lets one action compute both subtrees (and materialize the edge
    # pin exactly once, at whichever subtree reads it first)
    tri_n = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    out = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(F.col("d")) / 2).cast("long").alias("n_edges"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    ).crossJoin(F.broadcast(tri_n))
    return out.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        F.round(
            F.try_divide(F.lit(3.0) * F.col("n_triangles"), F.col("n_wedges")),
            round_to,
        ).alias("clustering"),
    )
