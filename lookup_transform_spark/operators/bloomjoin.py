"""Bloom-prefiltered semi join: shrink a fact-side shuffle with a tiny
broadcastable summary of a large-but-selective key set.

The 100 TB problem this solves: a semi join `fact SEMI JOIN keys` where
``keys`` is too big to broadcast raw (say, a quarter of a 100 TB orders
table) forces a full shuffle of the fact side. Spark's own runtime
semi-join reduction (`spark.sql.optimizer.runtime.bloomFilter.*`) only
injects when plan statistics prove the creation side small — which
never happens for a filtered scan without CBO stats (filters don't
shrink `sizeInBytes`), and `bloom_filter_agg` is not in the public
function registry to do it by hand. So this operator builds the filter
explicitly:

- **build**: one pass over the key side. Each input partition sets bits
  in a local numpy bitmap (JVM-side ``xxhash64`` base hash, double
  hashing for k probes, Kirsch-Mitzenmacher); partitions emit ONE
  binary row each, OR-merged tree-style (an extra mapInPandas level
  whenever more than ``merge_fanin`` bitmaps are outstanding) so the
  driver only ever collects ``merge_fanin`` rows regardless of input
  partition count. An m-bit filter is m/8 bytes — 1 MiB summarizes tens
  of millions of keys at ~1e-5 false-positive rate.
- **probe**: the bitmap broadcasts (torrent broadcast, once per
  executor); a vectorized pandas UDF checks the k bit positions per
  Arrow batch. Probing happens BEFORE the join exchange, so the fact
  shuffle carries only probable matches.
- **exactness**: the operator finishes with the real semi join on the
  survivors — Bloom false positives are eliminated there, so results
  are bit-identical to the plain semi join (pinned in
  ``tests/test_bloomjoin.py``, and the registered query shares an
  exact SQL oracle). The filter only reduces shuffled bytes; it never
  changes semantics.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the default m=2^23
bits / k=5 gives ~1e-5 at n=200k keys and degrades gracefully — an
undersized filter costs shuffle volume, never correctness.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _positions(hashes: np.ndarray, num_bits: int, num_hashes: int):
    """Kirsch-Mitzenmacher double hashing: k positions from one 64-bit
    hash — h1 + i·h2 mod m, with h2 forced odd. uint64 wrap-around is
    deterministic and fine for a Bloom filter."""
    hv = hashes.view(np.uint64)
    m = np.uint64(num_bits)
    h1 = hv % m
    h2 = ((hv >> np.uint64(33)) << np.uint64(1)) | np.uint64(1)
    for i in range(num_hashes):
        yield (h1 + np.uint64(i) * h2) % m


def build_bloom(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    merge_fanin: int = 64,
) -> bytes:
    """One pass over the key side → m-bit Bloom filter as bytes.

    Per-partition bitmaps (mapInPandas, one binary row per partition)
    are OR-merged tree-style: while more than ``merge_fanin`` bitmap
    rows are outstanding, another mapInPandas level merges them, so the
    driver never collects more than ``merge_fanin`` × m/8 bytes no
    matter how many input partitions the key scan has.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    words = num_bits // 64
    hashed = keys.select(F.xxhash64(F.col(key_col)).alias("__h__"))

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            hv = pdf["__h__"].to_numpy(dtype=np.int64)
            for pos in _positions(hv, num_bits, num_hashes):
                np.bitwise_or.at(
                    bm, pos >> np.uint64(6),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        if seen:
            yield pd.DataFrame({"bitmap": [bm.astype("<u8").tobytes()]})

    def _merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            for raw in pdf["bitmap"]:
                bm |= np.frombuffer(raw, dtype="<u8")
                seen = True
        if seen:
            yield pd.DataFrame({"bitmap": [bm.astype("<u8").tobytes()]})

    bitmaps = hashed.mapInPandas(_build, "bitmap binary")
    n_parts = hashed.rdd.getNumPartitions()
    while n_parts > merge_fanin:
        n_parts = max(1, n_parts // merge_fanin)
        bitmaps = bitmaps.repartition(n_parts).mapInPandas(
            _merge, "bitmap binary"
        )
    out = np.zeros(words, dtype=np.uint64)
    for row in bitmaps.collect():
        out |= np.frombuffer(row["bitmap"], dtype="<u8")
    return out.astype("<u8").tobytes()


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: bytes,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> Column:
    """Vectorized membership probe: broadcast the bitmap once per
    executor, gather the k bit positions per Arrow batch. False
    positives possible (rate set by sizing), false negatives never."""
    bc = df.sparkSession.sparkContext.broadcast(bloom)

    @pandas_udf("boolean")
    def _probe(h: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype="<u8")
        hv = h.to_numpy(dtype=np.int64)
        ok = np.ones(len(hv), dtype=bool)
        for pos in _positions(hv, num_bits, num_hashes):
            bits = bm[pos >> np.uint64(6)] >> (pos & np.uint64(63))
            ok &= (bits & np.uint64(1)).astype(bool)
        return pd.Series(ok)

    return _probe(F.xxhash64(F.col(key_col)))


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact semi join with a Bloom prefilter on the fact side.

    Identical results to ``fact.join(keys, on, "left_semi")`` — the
    final semi join removes Bloom false positives — but the fact rows
    that reach the join exchange are only the probable matches, so the
    shuffle shrinks by the semi join's selectivity (the raw key set
    never broadcasts; the m/8-byte bitmap does)."""
    bloom = build_bloom(keys, keys_key, num_bits, num_hashes)
    pre = fact.filter(
        bloom_might_contain(fact, fact_key, bloom, num_bits, num_hashes)
    )
    return pre.join(
        keys, pre[fact_key] == keys[keys_key], "left_semi"
    )
