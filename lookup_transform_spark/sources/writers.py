"""Sinks (SURVEY.md §2.2 B3): parquet (partitioned) / CSV / JSON.

Partition-aware writes are the scale contract: a 100 TB table written
``partitionBy`` on its natural pruning key turns downstream scans into
partition-pruned reads. ``max_records_per_file`` guards against the
small-files problem on high-cardinality partition keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_binary_files(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    suffix: str = ".bin",
) -> None:
    """Write one raw binary file per row, named ``<id><suffix>`` —
    executor-side via foreachPartition, so a 100 TB export streams at
    cluster width with nothing driver-collected. ``path`` must be
    shared storage (object store / DFS) on a real cluster; a local
    directory serves in local[n] tests. Writes a ``_SUCCESS`` sentinel
    on completion, mirroring Hadoop committer convention (and giving
    fixture-staleness checks an mtime anchor)."""
    import os

    os.makedirs(path, exist_ok=True)

    def _write(rows) -> None:
        for r in rows:
            with open(os.path.join(path, f"{r[id_col]}{suffix}"), "wb") as fh:
                fh.write(bytes(r[payload_col]))

    df.select(id_col, payload_col).foreachPartition(_write)
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
