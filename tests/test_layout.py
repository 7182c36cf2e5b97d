"""Z-order code: cross-engine bit parity + bijectivity; weighted
sampling: rate monotonicity.
"""

from __future__ import annotations

import duckdb
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lookup_transform_spark.operators.layout import zorder_code, zorder_code_sql
from lookup_transform_spark.operators.sampling import weighted_sample

SF = "/root/testdata/sf0.001"


def py_morton(a: int, b: int, bits: int = 8) -> int:
    code = 0
    for j in range(bits):
        code |= ((a >> j) & 1) << (2 * j + 1)
        code |= ((b >> j) & 1) << (2 * j)
    return code


def py_demorton(code: int, bits: int = 8) -> tuple[int, int]:
    a = b = 0
    for j in range(bits):
        a |= ((code >> (2 * j + 1)) & 1) << j
        b |= ((code >> (2 * j)) & 1) << j
    return a, b


@given(st.integers(0, 255), st.integers(0, 255))
def test_morton_bijective(a, b):
    assert py_demorton(py_morton(a, b)) == (a, b)


def test_zorder_code_matches_python_and_duckdb(spark):
    grid = [(a, b) for a in range(0, 256, 37) for b in range(0, 256, 41)]
    df = spark.createDataFrame(grid, "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_code(F.col("a"), F.col("b")).alias("z")).collect()
    }
    duck = {
        (a, b): duckdb.sql(f"SELECT {zorder_code_sql('a', 'b')} FROM (SELECT {a} a, {b} b)").fetchone()[0]
        for a, b in grid[:20]
    }
    for (a, b), z in got.items():
        assert z == py_morton(a, b)
    for (a, b), z in duck.items():
        assert z == py_morton(a, b)


def test_weighted_sample_rate_monotone(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    low = weighted_sample(docs, "lang", {"en": 0.3}, "doc_id", default_rate=0.1)
    high = weighted_sample(docs, "lang", {"en": 0.8}, "doc_id", default_rate=0.5)
    low_ids = {r["doc_id"] for r in low.collect()}
    high_ids = {r["doc_id"] for r in high.collect()}
    # raising every stratum's rate can only ADD documents (hash-threshold
    # sampling is monotone): reprocessing with a bigger budget is a
    # superset, never a reshuffle of which docs were kept
    assert low_ids <= high_ids
