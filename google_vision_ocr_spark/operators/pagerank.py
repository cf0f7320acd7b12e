"""PageRank in exact fixed-point integer arithmetic — host-graph
authority scoring (the web-corpus curation signal), built so that two
independent engines replay it BIT-IDENTICALLY.

Float PageRank cannot sit under a cross-engine hash gate: each node's
inflow is a sum of doubles whose order differs per engine/partitioning,
so ranks drift by ULPs and comparisons/rounds flip.  Here every
quantity is an int64 on a fixed 10^12 scale and every division is
integer `div` (floor — all values non-negative):

    r0(v)    = SCALE div N
    teleport = ((100-d)·SCALE) div (100·N)
    r'(v)    = teleport + (d · Σ_in (r(u) div deg(u))) div 100

Sums of int64 are order-independent, so the result is a pure function
of (graph, iterations) — the same idea as the integer-cents money
queries and the ppm resampling thresholds.

Scale shape: per iteration one shuffle join of edges against ranks on
src (deg joins are broadcast-size after the per-src aggregate of a
host graph — hosts ≪ documents) and one map-side-combinable
``groupBy(dst).sum``.  N rides a 1-row count frame cross-joined in,
never a driver scalar.  For deep iteration counts the rank frame is
lineage-cut every ``checkpoint_every`` rounds (same Pregel-on-
DataFrames requirement documented in components.py).

Dangling nodes (no out-edges) leak their mass — the classic simplified
variant; both the operator and any oracle replay must share that
convention, and do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Rank nodes of the (deduplicated, directed) edge list; returns
    (node, rank) with rank an int64 on the 10^12 fixed-point scale."""
    if not (0 <= damping_pct <= 100):
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base = nodes.crossJoin(F.broadcast(n)).select(
        "node",
        F.expr(f"CAST({(100 - damping_pct) * SCALE} AS BIGINT) div (100 * __n)")
        .alias("__t"),
        F.expr(f"CAST({SCALE} AS BIGINT) div __n").alias("r"),
    )
    r = base
    for i in range(iterations):
        inflow = (
            e.join(r.select(F.col("node").alias("src"), "r"), "src")
            .join(F.broadcast(deg), "src")
            .select(F.col("dst").alias("node"), F.expr("r div deg").alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__inflow"))
        )
        r = (
            base.drop("r")
            .join(inflow, "node", "left_outer")
            .select(
                "node",
                "__t",
                (F.col("__t")
                 + F.expr(f"({damping_pct} * coalesce(__inflow, CAST(0 AS BIGINT)))"
                          " div 100")).alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            r = r.localCheckpoint(eager=True)
    return r.select("node", F.col("r").alias("rank"))
