"""Bucketed co-located joins (SURVEY.md 100-TB notes: "co-locate joins
via bucketing").

Writing both fact tables bucketed by the join key lets Spark join them
with ZERO shuffle — each bucket pair joins locally. At 100 TB this is
the difference between re-shuffling terabytes per query and reading
pre-organized data; the write-side cost is paid once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Bucketed
    layout requires the table catalog (saveAsTable), not a bare path."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_by:
        w = w.sortBy(sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket columns; with
    matching bucket counts the plan contains no shuffle Exchange on
    either side (asserted in tests/test_plans.py)."""
    lf = spark.table(left_table)
    rt = spark.table(right_table)
    return lf.join(rt, lf[left_on] == rt[right_on], how=how)
