"""Iterative graph operators: connected components for dedup clustering.

Near-duplicate PAIRS (minhash/simhash output) become dedup CLUSTERS via
connected components — the standard final step of a corpus dedup
pipeline (keep one doc per component).

Implementation: alternating large-star/small-star-style min-label
propagation expressed as DataFrame joins, iterated to a fixpoint. Each
iteration is one shuffle join + aggregate; ``localCheckpoint`` truncates
the growing lineage so plans stay bounded (mandatory for iterative
algorithms at scale). Converges in O(log n) iterations on real graphs.

The ENGINE formulation is iterative (no fixed-depth SQL computes
components at scale), but at fixture scale the registry entry carries a
DuckDB oracle since r8: a recursive-CTE transitive closure over the
exact-Jaccard pair set cross-checks the component labels end-to-end.
Correctness is additionally pinned by tests against a pure-Python
union-find on the same edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair once is fine).
    """
    # symmetric edge list — checkpoint FIRST so the (possibly expensive)
    # upstream pair-generation pipeline executes exactly once; everything
    # below, including the node set, derives from the materialized edges.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )

    # node set with initial label = own id (sym is symmetric, so one side
    # covers every endpoint)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("component"))

    prev_sum = None
    for _ in range(max_iterations):
        # propagate: each node takes min(own label, neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("neighbor_component"))
        )
        updated = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # materialize BEFORE the self-join below: `updated` appears on
        # both sides of the doubling join, and as a lazy plan the whole
        # propagate join+aggregate would execute twice per iteration
        updated = updated.localCheckpoint()
        # pointer doubling: component ← component(component). Without
        # this, convergence is O(diameter) (a path graph needs one round
        # per hop); with it, O(log n) rounds.
        jump = updated.select(
            F.col("node").alias("__c_node__"),
            F.col("component").alias("__c_comp__"),
        )
        updated = (
            updated.join(
                jump, updated["component"] == jump["__c_node__"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__c_comp__"), F.col("component")),
                ).alias("component"),
            )
        )
        # checkpoint FIRST (truncates lineage and materializes), then run
        # the fixpoint probe against the cached result — otherwise the
        # probe re-executes the whole iteration's joins
        updated = updated.localCheckpoint()
        # fixpoint probe: labels only ever decrease, so the label sum
        # strictly decreases iff anything changed — one cheap aggregate
        # over the materialized result instead of a self-join. Decimal
        # sum: immune to ANSI long overflow at any node-id magnitude.
        new_sum = updated.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]
        labels = updated
        # empty node set sums to NULL (None here): the answer is known —
        # nothing to propagate — and `None == None` never trips the
        # prev_sum comparison, so without this check an empty edge set
        # would burn every remaining iteration on no-op checkpoints +
        # collects (r8 review)
        if new_sum is None or (prev_sum is not None and new_sum == prev_sum):
            break
        prev_sum = new_sum
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
) -> DataFrame:
    """Collapse near-dup pairs into clusters; output one row per member
    with its cluster id (min doc id in the component) and a keep flag
    for the canonical representative."""
    comps = connected_components(pairs, src=id_a, dst=id_b)
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
