"""Distributed k-means (SURVEY.md §2 extension tier, alongside the
connected-components fixpoint in graph.py): Lloyd's algorithm shaped
for a billion-vector corpus.

Per iteration:
- **assign**: centroids ride into task closures as a dense (k × d)
  numpy matrix (k·d is tiny by construction), each Arrow batch is one
  ``(batch × d) @ (d × k)`` matmul — O(n·k·d) flops, corpus scanned
  once, no crossJoin, no per-pair Python.
- **update**: per-element ``avg`` over the assigned cluster — d
  column expressions in one JVM hash aggregate, so the shuffle carries
  only k × d partial sums per map task (map-side combine), never
  vectors. Element sums accumulate in DECIMAL so the means — and hence
  the next iteration's assignments — are independent of partitioning
  and row order (the same determinism trick the TPC-H aggregates use).

The corpus DataFrame is evaluated ``iters + 1`` times (once per assign
plus the final output); callers at scale should pass an already
materialized (cached / checkpointed) input. Iteration count is fixed
and small — classic Lloyd's converges in practice long before the
assignment stabilizes exactly, and a fixed budget keeps the job DAG
static (no driver-side convergence probe reading the full corpus).

No counterpart in the reference (its only operator is the lookup
join); this is part of the mandated large-scale-pipeline extension
tier. Pinned against a pure-numpy Lloyd's replica in
tests/test_clustering.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_udf(
    cent: np.ndarray, id_col: str, vec_col: str, carry_vec: bool
):
    """mapInPandas stage: nearest centroid per vector (squared
    Euclidean, ties broken toward the lowest cluster index).
    ``carry_vec`` passes the vector through so the centroid-update
    aggregate needs NO join back to the source."""

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant
            # per row, so argmin needs only the last two terms.
            d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (m @ cent.T)
            out = {
                id_col: pdf[id_col].to_numpy(dtype=np.int64),
                "cluster_id": np.argmin(d2, axis=1).astype(np.int64),
            }
            if carry_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return assign


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
) -> DataFrame:
    """Lloyd's k-means; returns (id, cluster_id) for every input row.

    Initial centroids are the vectors of the ``k`` smallest ids —
    deterministic and cheap (one tiny sorted limit), the same
    deterministic-seed convention as the IVF centroid sample.
    """
    dim = len(df.select(vec_col).first()[0])
    init = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cent = np.array([r[vec_col] for r in init], dtype=np.float64)

    src = df.select(id_col, vec_col)
    out_schema = f"{id_col} long, cluster_id long"
    carry_schema = f"{out_schema}, {vec_col} array<float>"
    for _ in range(iters):
        assigned = src.mapInPandas(
            _assign_udf(cent, id_col, vec_col, carry_vec=True), carry_schema
        )
        # DECIMAL accumulation → partition-order-independent means.
        means = (
            assigned.groupBy("cluster_id")
            .agg(
                *[
                    F.avg(F.col(vec_col)[i].cast("decimal(28,10)"))
                    .cast("double")
                    .alias(f"c{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        nxt = cent.copy()  # empty cluster keeps its previous centroid
        for r in means:
            nxt[r["cluster_id"]] = [r[f"c{i}"] for i in range(dim)]
        cent = nxt
    return src.mapInPandas(
        _assign_udf(cent, id_col, vec_col, carry_vec=False), out_schema
    )


def kmeans_numpy(
    ids: np.ndarray, vecs: np.ndarray, k: int, iters: int
) -> np.ndarray:
    """Single-node reference replica (ground truth for the pinned
    test): identical init, assignment rule, and mean update."""
    order = np.argsort(ids)
    cent = vecs[order[:k]].astype(np.float64)
    v = vecs.astype(np.float64)
    lab = None
    for _ in range(iters):
        d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (v @ cent.T)
        lab = np.argmin(d2, axis=1)
        for c in range(k):
            if (lab == c).any():
                cent[c] = v[lab == c].mean(axis=0)
    d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (v @ cent.T)
    return np.argmin(d2, axis=1)
