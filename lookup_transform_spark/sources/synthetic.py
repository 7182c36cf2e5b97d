"""Custom Python DataSource (Spark 4 extension point): a deterministic
synthetic document-corpus generator.

Why it exists: load-testing a 100 TB pipeline should not require 100 TB
of staged input. A generator source produces arbitrarily large corpora
straight into the scan — partition-parallel (each InputPartition derives
its rows independently), zero I/O, and deterministic (rows are a pure
function of (seed, doc_id)), so runs are reproducible and results
comparable across engines/sessions.

This also demonstrates the modern way to add a *source* to Spark from
Python (``pyspark.sql.datasource.DataSource``), complementing the
built-in parquet/CSV/JSON/ORC readers in ``sources/readers.py``.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

LANGS = ("en", "de", "es", "fr", "zh")
_WORDS = (
    "data spark table scan filter join group window stream batch "
    "row value key hash sort merge shuffle part order time"
).split()

SCHEMA = "doc_id long, lang string, source string, text string, n_chars int"


def _mix(x: int) -> int:
    """splitmix64 finalizer — a deterministic, well-distributed int hash."""
    x = (x + 0x9E3779B97F4A7C15) & (1 << 64) - 1
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
    return x ^ (x >> 31)


def make_doc(seed: int, doc_id: int) -> tuple[int, str, str, str, int]:
    h = _mix(seed * 1_000_003 + doc_id)
    lang = LANGS[h % len(LANGS)]
    source = f"src{(h >> 8) % 20}"
    n_words = 5 + (h >> 16) % 40
    words = [
        _WORDS[_mix(h + i) % len(_WORDS)] for i in range(n_words)
    ]
    text = " ".join(words)
    return doc_id, lang, source, text, len(text)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("n", N).option("parts", P)``
    — N documents across P independent partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        # round-robin id assignment: each partition generates its own
        # slice independently — no coordination, linear scale-out
        for doc_id in range(partition.value, self.n, self.parts):
            yield make_doc(self.seed, doc_id)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
