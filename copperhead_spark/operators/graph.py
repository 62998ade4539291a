"""Distributed connected components (hash-min label propagation).

The dedup family (operators/dedup.py, plans/dedup.py) produces candidate
*pairs*; an actual dedup decision needs *clusters* — every document
labeled with the minimum doc_id reachable through the duplicate-pair
graph, so one canonical representative survives per cluster.  The
reference has no counterpart (it is strictly batch HEP analytics); this
is part of the mandated training-data-pipeline surface.

Algorithm: iterative hash-min propagation.  Each round every node takes
the min of its own label and its neighbors' labels; converges in
O(graph diameter) rounds.  Per round the physical plan is one shuffled
hash join (edges ⋈ labels on dst) + one partial/final hash aggregate
(min per src) + one left join back — all standard Exchange-on-key
operators that scale linearly with |E| per round.

Scale notes (100 TB corpus, ~10^10 nodes):
- LSH duplicate graphs are shallow (near-dup clusters are dense, so the
  min label floods a cluster in 2-4 rounds); the iteration count is
  bounded by cluster diameter, not corpus size.
- ``localCheckpoint(eager=True)`` after each round truncates lineage —
  without it the logical plan doubles per iteration and Catalyst
  analysis time explodes long before data size matters.  On a real
  cluster use ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``
  for fault-tolerant truncation; localCheckpoint keeps the local[*]
  test path dependency-free.
- For adversarially high-diameter graphs (long chains), swap in the
  alternating large-star/small-star rounds of Kiveris et al. — the same
  join/agg primitives, O(log^2 n) rounds; not needed for dedup graphs.
- Convergence is detected by counting changed labels per round (labels
  only ever decrease, so "0 changed" is a fixed point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    component_col: str = "component",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with the min node id in its connected component.

    ``nodes``: one column ``node_col`` (every vertex, isolated ones too).
    ``edges``: columns ``src_col``, ``dst_col`` (undirected; duplicates
    are harmless — min() is idempotent, so no distinct() shuffle is
    spent on them).

    Returns a DataFrame (node_col, component_col).  Runs Spark actions
    internally (one count per round) — call it like an algorithm, not a
    lazy transform.
    """
    # symmetrize once; hash-min needs messages in both directions.
    # Repartition on the join key BEFORE checkpointing: the checkpoint
    # materializes the edge list already hash-partitioned on b, so every
    # round's edges-join-labels reuses that layout instead of re-shuffling
    # |E| rows per iteration — at corpus scale the edge shuffle dominates
    # everything else in the loop.
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    rev = edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    sym = fwd.unionByName(rev).repartition(F.col("b")).localCheckpoint()

    all_nodes = nodes.select(F.col(node_col).alias("node"))
    # r12: iterate over edge ENDPOINTS only.  A node with no incident
    # edge never appears in ``sym`` — it can neither receive nor send a
    # message, so its label is itself forever; carrying it through every
    # round's join/aggregate/checkpoint only inflates the loop (in a
    # dedup graph the isolated nodes are the overwhelming majority of
    # the corpus — at 10^10 nodes with 10^8 pair endpoints this shrinks
    # every per-round shuffle ~100x, guide §2.3).  Isolated nodes are
    # re-attached with their identity label in the one final left join
    # below.  Endpoints are intersected with ``nodes`` so the contract
    # is unchanged: a dangling edge endpoint absent from ``nodes`` still
    # never gains a label row.
    touched = all_nodes.join(
        sym.select(F.col("a").alias("node")).distinct(), "node", "left_semi"
    ).localCheckpoint()
    labels = touched.select("node", F.col("node").alias("comp"))

    for _ in range(max_iter):
        # neighbor minimum per node: shuffle on b (join) then a (agg)
        msgs = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbmin"))
        )
        upd = labels.join(msgs, labels["node"] == msgs["a"], "left")
        new_labels = upd.select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nbmin"), F.col("comp"))).alias(
                "comp"
            ),
            (F.coalesce(F.col("nbmin"), F.col("comp")) < F.col("comp")).alias(
                "_changed"
            ),
        ).localCheckpoint()
        n_changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if n_changed == 0:
            break

    # isolated nodes rejoin with their identity label (they never
    # received a message in the original all-nodes loop either)
    return all_nodes.join(labels, "node", "left").select(
        F.col("node").alias(node_col),
        F.coalesce(F.col("comp"), F.col("node")).alias(component_col),
    )
