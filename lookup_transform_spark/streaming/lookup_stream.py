"""Streaming tier (SURVEY.md §2.2 B60): stream-static lookup.

The reference registers the Lookup plugin for streaming pipelines
(pom.xml:30) but implements batch only; this module supplies the
natural streaming reading — a Structured Streaming source enriched by
a static dimension with the same LookupSpec semantics. The static side
of a stream-static join is effectively broadcast per micro-batch,
mirroring the reference's broadcast flag (Lookup.java:208).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lookup_transform_spark.plans.lookup import LookupSpec


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (ns parquet → µs ts,
    same normalization as registry._events). The file source requires a
    directory, so the single fixture file is staged via symlink."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    stage = os.path.join(
        repo, ".scratch", f"stream_events_{os.path.basename(sf_dir)}"
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)

    stream = spark.readStream.schema(batch.schema).parquet(stage)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        # µs-precision parquet reads as NTZ; watermarks/event-time need
        # TIMESTAMP. Session tz is pinned UTC → epoch-preserving cast.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def stream_static_lookup(
    stream_df: DataFrame, static_lookup: DataFrame, spec: LookupSpec
) -> DataFrame:
    """B60: LookupSpec applied with a streaming input side. Stream-static
    joins are stateless — each micro-batch joins against the static
    snapshot; left-outer is supported for stream-on-the-left."""
    return spec.apply(stream_df, static_lookup)


def run_to_memory(
    df: DataFrame,
    name: str | None = None,
    output_mode: str = "append",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Execute a streaming plan to completion (availableNow trigger) into
    a memory sink; returns the result as a batch DataFrame. This is how
    the rows-only streaming queries execute under the driver harness.

    ``state_partitions`` bounds the state-store count for the run:
    stateful operators allocate one store per shuffle partition, and an
    oversized default (tuned for batch scans) turns micro-batch commits
    into pure store-bookkeeping overhead. The partition count of a
    stateful streaming query is FIXED at its first run by the
    checkpoint, so this is a per-query deployment decision, not a
    session conf — size it to expected state volume, not batch width.
    Pass ``None`` to inherit the session default.
    """
    spark = df.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    table = name or f"mem_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get(conf_key)
    if state_partitions is not None:
        spark.conf.set(conf_key, str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(table)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set(conf_key, prev)
    return spark.table(table)
