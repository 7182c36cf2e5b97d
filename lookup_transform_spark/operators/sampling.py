"""Deterministic dataset splitting & sampling (training-pipeline tier).

``rand()`` splits are non-reproducible across runs and engines; content
hashing is the standard fix: bucket = first 16 bits of md5(key) → a
stable [0, 65536) value both this engine and any SQL oracle compute
identically. Splits are then pure filters — no shuffle, no state, and a
document keeps its split assignment forever (the property that prevents
train/test leakage when the corpus is re-processed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 1 << 16


def hash_bucket(col: str | Column) -> Column:
    """Stable [0, 65536) bucket from md5 (cross-engine reproducible:
    DuckDB twin is ('0x' || substr(md5(x), 1, 4))::INTEGER)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int")


def dataset_split(
    df: DataFrame,
    key_col: str,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Append a ``split`` column: train/val/test by hash-bucket ranges."""
    b = hash_bucket(key_col)
    t_hi = int(BUCKETS * train)
    v_hi = int(BUCKETS * (train + val))
    return df.withColumn(
        "split",
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test"),
    )


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic Bernoulli sampling at a per-stratum rate — the
    corpus-mixing / domain-reweighting step of a training-data pipeline
    (e.g. keep 100% of English, 25% of zh, 10% of everything else).

    Keep iff hash_bucket(key) < rate * 65536: pure narrow filter (no
    shuffle, no state), reproducible across runs and engines, and a
    row's keep/drop decision is stable under reprocessing. Rates arrive
    as a literal CASE expression, so at 100 TB this is a single
    codegen'd predicate evaluated inside the scan."""
    thresh: Column | None = None
    for stratum, rate in sorted(rates.items()):
        pred = F.col(strata_col) == stratum
        lit = F.lit(int(BUCKETS * rate))
        thresh = F.when(pred, lit) if thresh is None else thresh.when(pred, lit)
    default = F.lit(int(BUCKETS * default_rate))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(hash_bucket(key_col) < thresh)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, chosen by hash order
    (deterministic, uniform-ish, reproducible across engines/runs)."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(key_col).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n_per_stratum)
        .drop("__rn__")
    )
