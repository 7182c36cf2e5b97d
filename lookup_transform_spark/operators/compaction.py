"""Small-files compaction (SURVEY.md 100-TB notes: partition hygiene).

High-frequency ingestion leaves thousands of KB-sized files per
partition; scan cost becomes per-file overhead instead of bytes. The
compactor rewrites a dataset to a target file count (or target records
per file), preserving partition columns. At scale this runs per
partition-predicate so only hot partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Read ``src``, rewrite to ``dst`` with a bounded file count.

    ``coalesce`` (no shuffle) when reducing file count; Spark splits
    output by ``maxRecordsPerFile`` when bounding file size instead.
    Returns the compacted DataFrame (for row-count verification).
    """
    df = spark.read.parquet(src)
    out = df.coalesce(target_files) if target_files else df
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dst)
    return spark.read.parquet(dst)
