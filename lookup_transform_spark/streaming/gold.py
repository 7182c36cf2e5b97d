"""Incremental gold-table maintenance via foreachBatch (streaming sink
pattern for SURVEY.md §2.2 B3+B60).

Streaming aggregations in update mode emit changed keys per micro-batch;
``foreachBatch`` applies them to a batch-readable "gold" parquet table.
With a partition key in the output, each micro-batch overwrites ONLY the
partitions it touched (dynamic partition overwrite) — the idempotent
upsert pattern used when the sink has no native MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_gold_counts(
    stream_df: DataFrame,
    gold_path: str,
    checkpoint: str,
    key: str = "event_type",
):
    """Maintain per-key running counts/sums in a parquet gold table.

    Update-mode aggregation → foreachBatch → dynamic partition overwrite
    of only the touched ``key=`` partitions.
    """
    agg = stream_df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # per-write option, NOT a session conf mutation: setting the
        # session-wide partitionOverwriteMode inside foreachBatch would
        # silently turn every later plain overwrite in this session into
        # a dynamic one (same rationale as writers.upsert_partitioned)
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(key)
            .parquet(gold_path)
        )

    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
