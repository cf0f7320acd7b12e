"""Connected components — turning near-duplicate PAIRS into CLUSTERS.

Every dedup family here (MinHash, SimHash, embedding-LSH, exact
Jaccard) emits candidate/confirmed *pairs*; the corpus operation that
follows is "keep one document per duplicate CLUSTER", which is
connected components over the pair graph.

The implementation is iterative MIN-LABEL PROPAGATION: each round,
every node adopts the minimum label in its closed neighborhood, one
hash-shuffled join + one map-side-combinable ``groupBy().min()`` per
round.  Rounds needed = graph diameter — and dedup graphs are stars
and near-cliques (diameter 2-3), which is why this is the right
practical shape; a corpus with adversarially long duplicate CHAINS
would want the O(log n)-round alternating large-star/small-star
edge rewriting instead (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — same per-round primitive, so it
slots into this loop).  ``max_rounds`` guards the pathological case.

Implementation notes:

- labels are node ids; each round every node adopts the MINIMUM label
  in its neighborhood (`groupBy(node).agg(min(label))` — map-side
  combinable, so the hottest node (a boilerplate hub) reduces
  per-partition before the shuffle);
- convergence is checked with a single count of changed labels per
  round (one action per round, on an aggregate — not a collect of
  data);
- each round's label frame is cut from its lineage with
  ``localCheckpoint(eager=True)``.  ``persist()`` alone is NOT enough
  for an iterative DataFrame loop: the label frame feeds the next
  round twice (propagation join + union), so the LOGICAL plan doubles
  every round and Catalyst re-analyzes the whole tree — a 14-round
  chain OOMs the driver on plan analysis long before any data is big.
  Checkpointing truncates the plan to a leaf each round (the classic
  Pregel-on-DataFrames requirement; a production run on preemptible
  executors would use reliable ``checkpoint()`` to storage instead).

The oracle (``dedup_clusters``) replays reachability with a recursive
CTE over the same edge set, so the component ids — not just their
sizes — are hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import cache


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """``(node, component)`` for every node in ``edges``; the component
    id is the minimum node id in the component."""
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = cache.track(sym.persist())
    # init: every node labels itself with the min of (itself, neighbors)
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("label"))
        .select("node", F.least("node", "label").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # propagate: every node adopts min(own label, neighbors' labels)
        nbr = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            nbr.unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))
