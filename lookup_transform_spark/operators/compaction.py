"""Small-files compaction (SURVEY.md 100-TB notes: partition hygiene).

High-frequency ingestion leaves thousands of KB-sized files per
partition; scan cost becomes per-file overhead instead of bytes. The
compactor rewrites a dataset to a target file count (or target records
per file), preserving partition columns. At scale this runs per
partition-predicate so only hot partitions rewrite.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def compact_parquet_to_size(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Size-targeted compaction: derive the file count from the actual
    on-disk bytes of ``src`` (the policy a table-maintenance job uses —
    "files of ~128 MB", not "N files"), then delegate to
    ``compact_parquet``."""
    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, round(total / (target_mb * 1024 * 1024)))
    return compact_parquet(spark, src, dst, target_files=n_files, partition_by=partition_by)


def compact_parquet(
    spark: SparkSession,
    src: str | list[str],
    dst: str,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Read ``src`` (one path or a list — e.g. an ingest's committed
    per-batch directories), rewrite to ``dst`` with a bounded file
    count.

    ``coalesce`` (no shuffle) when reducing file count; Spark splits
    output by ``maxRecordsPerFile`` when bounding file size instead.
    Returns the compacted DataFrame (for row-count verification).
    """
    srcs = [src] if isinstance(src, str) else list(src)
    df = spark.read.parquet(*srcs)
    out = df.coalesce(target_files) if target_files else df
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dst)
    return spark.read.parquet(dst)
