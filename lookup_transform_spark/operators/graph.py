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


#: Edge count under which the component computation runs as a driver
#: union-find instead of the iterative join loop. Same reasoning as a
#: broadcast-join threshold: 2M (a, b) long pairs ≈ 32 MB on the
#: driver — a graph this small is a BROADCAST-class problem, and the
#: iterative path's 3 scheduled waves per round (propagate checkpoint,
#: pointer-doubling checkpoint, fixpoint probe) are pure constant
#: against it. Past the gate the small-star/large-star loop is the
#: only formulation that scales (no driver ever holds 100 TB of
#: edges). Outputs are identical by construction — min-label
#: components either way — pinned by the union-find equality test and
#: the recursive-CTE oracle; every structural test runs BOTH paths
#: (tests/test_graph.py forces the iterative loop by zeroing this).
#: Honest sizing of the win (r10 min-of-5 at sf0.1): dedup_clusters
#: 3.06 → 2.91 s — the upstream LSH pair generation dominates that
#: query, so the gate's value is the ~3-wave-per-round floor it
#: removes for callers whose pair set is already materialized, not a
#: headline cut.
_DRIVER_UNION_FIND_MAX_EDGES = 2_000_000


def _collect_edge_pairs(sym: DataFrame) -> "zip":
    """Collect the 2-column edge frame as an iterator of (a, b) tuples
    via Arrow — ``collect()`` materializes PySpark Row objects at
    ~10-20× the raw pair size in Python heap (ADVICE r10), which at the
    2M-edge gate ceiling is the difference between ~32 MB and ~500 MB."""
    tbl = sym.toArrow()
    return zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist())


def _driver_union_find(sym_rows) -> list[tuple]:
    """Min-label union-find over collected symmetric edges; returns
    sorted (node, component) pairs."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in sym_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root — the component label contract
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return sorted((n, find(n)) for n in parent)


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

    # r10 gate: the checkpoint already materialized the edges, so this
    # count is a cached-block scan, not a recomputation
    n_edges = sym.count()
    if n_edges <= _DRIVER_UNION_FIND_MAX_EDGES:
        labels = _driver_union_find(_collect_edge_pairs(sym))
        spark = sym.sparkSession
        if not labels:
            return sym.select(
                F.col("a").alias("node"), F.col("a").alias("component")
            )
        # output dtype follows the INPUT id column (ADVICE r10: the
        # hardcoded long schema made the two gate paths disagree for
        # non-long ids — the iterative path below preserves the type)
        from pyspark.sql import types as T

        id_dt = edges.schema[src].dataType
        schema = T.StructType(
            [
                T.StructField("node", id_dt, False),
                T.StructField("component", id_dt, False),
            ]
        )
        return spark.createDataFrame(labels, schema)

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
