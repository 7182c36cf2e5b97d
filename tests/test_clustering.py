"""Pin distributed Lloyd's k-means against a single-node numpy replica
(the same ground-truth convention as graph.py's union-find pin)."""

from __future__ import annotations

import numpy as np
import pytest

from lookup_transform_spark.operators.clustering import (
    kmeans_assign,
    kmeans_numpy,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_vectors(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    vecs = np.array([r.embedding for r in rows], dtype=np.float32)
    return ids, vecs


def test_kmeans_matches_numpy_replica(spark, fixture_vectors):
    ids, vecs = fixture_vectors
    expected = dict(zip(ids, kmeans_numpy(ids, vecs, k=8, iters=5)))
    got = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
            "vec_id",
            "embedding",
            k=8,
            iters=5,
        ).collect()
    }
    assert len(got) == len(ids)
    mism = {i for i in got if got[i] != expected[i]}
    assert not mism, f"{len(mism)} assignment mismatches: {sorted(mism)[:5]}"


def test_kmeans_partitioning_invariant(spark, fixture_vectors):
    """Decimal-mean centroid updates make the result independent of
    input partitioning — the property that lets the operator run at any
    cluster width."""
    ids, _ = fixture_vectors
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(df, "vec_id", "embedding", 5, 3).collect()
    }
    b = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(
            df.repartition(17), "vec_id", "embedding", 5, 3
        ).collect()
    }
    assert a == b
