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


def upsert_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    validate_no_key_moves: bool = False,
) -> None:
    """MERGE-style upsert into a hive-partitioned parquet table, touching
    only the partitions the update batch lands in.

    The 100 TB ingestion primitive vanilla parquet lacks (table formats
    get it from MERGE INTO): per-batch cost must be O(affected
    partitions), never a rewrite of the table. Mechanics:

    1. the update batch's partition values are collected (partition-
       cardinality-sized — the same dimension-collect class as the IVF
       centroid table);
    2. existing rows of ONLY those partitions are read back (the IN-list
       becomes a partition filter — directory pruning, pinned in
       tests/test_upsert.py), minus rows whose key is being replaced
       (left-anti on the key);
    3. survivors ∪ updates are written with DYNAMIC partition overwrite,
       so Spark stages and commits just the affected directories —
       untouched partitions keep their files byte-for-byte (also
       pinned).

    The read-modify-write cycle targets the same path it reads, which
    Spark's overwrite check rejects on a lazy plan — the merged batch is
    ``localCheckpoint``ed (materialized executor-side) first. That
    materialization is affected-partitions-sized, not table-sized.

    Semantics: a key present in both sides takes the update's row
    (upsert); keys appearing only in updates insert. CALLER CONTRACT:
    an update must carry its key's existing partition value — a key
    "moved" to a different partition would leave the old row in place
    (its partition isn't read) and write the new one, duplicating the
    key. This is NOT checked by default, because detecting it requires
    scanning the key column of the WHOLE table, which breaks the
    O(affected-partitions) cost contract; ``validate_no_key_moves=True``
    opts into that full-key-scan check (the key column alone is read —
    column-pruned — and the job fails loudly listing offenders before
    anything is written).
    """
    from pyspark.sql import functions as F

    existing = spark.read.parquet(path)
    if validate_no_key_moves:
        moved = (
            existing.select(*key_cols, partition_col)
            .join(
                updates.select(
                    *key_cols,
                    F.col(partition_col).alias("__new_part__"),
                ),
                on=key_cols,
            )
            .filter(F.col(partition_col) != F.col("__new_part__"))
        )
        offenders = moved.limit(5).collect()
        if offenders:
            raise ValueError(
                "upsert_partitioned: update batch moves key(s) across "
                f"partitions (first offenders: {offenders}); an upsert "
                "must keep each key in its existing partition"
            )
    parts = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    keep = (
        existing.filter(F.col(partition_col).isin(parts))
        .join(updates.select(*key_cols), on=key_cols, how="left_anti")
    )
    merged = keep.unionByName(updates.select(*existing.columns))
    merged = merged.localCheckpoint()  # break lineage: source == sink path
    # per-write option, NOT a session-conf save/restore: scoping dynamic
    # overwrite to this writer means a concurrent write in the same
    # session can't inherit it, and there's no restore to race
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
