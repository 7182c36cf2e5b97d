"""Streaming sketch maintenance (r10): continuous distinct-count
rollup — the B61/B32 crossover a 100 TB ingest actually runs.

Documents arrive in batches; each micro-batch contributes ONE tiny
leaf-sketch row per group (the portable md5-register HLL of
``operators/sketches.py``) to an at-rest summary table. A
distinct-count read then merges the standing leaves — per-(group,
bucket) MAX — without ever rescanning or re-shuffling the raw corpus.
This is the mergeable-sketch idiom from the batch tier
(``sketch_hll_portable``) driven by Structured Streaming: per-trigger
cost is O(batch + k·m), state is bounded (groups × 4096 int registers
per batch dir, foldable by the same per-bucket MAX whenever the leaf
count warrants compaction), and the answer is IDENTICAL to sketching
the full corpus directly.

Why this is oracle-EXACT despite being a multi-batch streaming side
effect (the r9 streaming-promotion rule): register values are
integer-exact and per-bucket MAX is associative AND commutative, so
the merged registers — and hence the 3-dp-rounded estimate — are a
pure function of the SET of arrived keys, independent of trigger
decomposition, batch order, or retries (an overwritten batch dir
re-emits the same leaf). The DuckDB oracle groups the raw fixture
keys directly (`hll_portable_oracle_sql`).

Retry contract: same as the ingest corpus — per-batch-directory
OVERWRITE keyed by batch_id, so at-least-once redelivery rewrites the
identical leaf instead of double-counting (and double-counting would
be absorbed by MAX anyway; n_rows is taken from the batch dir set, not
appended, so it cannot inflate either).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from lookup_transform_spark.streaming.ingest import (
    _read_batches,
    _reset_if_fixture_newer,
    compact_ingest_state,
    stage_document_batches,
)


def stream_sketch_rollup(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    group_col: str = "lang",
    n_files: int = 4,
    compact_every: int = 8,
) -> DataFrame:
    """Run the staged arrival batches through a foreachBatch sketch
    maintenance loop, then answer per-``group_col`` approximate
    distinct doc counts from the standing leaves. Returns
    (group, approx_distinct, n_rows)."""
    from lookup_transform_spark.operators.sketches import (
        hll_portable_estimate_from_leaves,
        hll_portable_sketch,
    )

    stage = os.path.join(work_dir, "arrivals")
    state = os.path.join(work_dir, "leaves")
    ckpt = os.path.join(work_dir, "ckpt")
    _reset_if_fixture_newer(spark, work_dir, stage, sf_dir)
    os.makedirs(state, exist_ok=True)
    # no injected duplicates: the union of the staged batches must BE
    # the fixture so the oracle can group the raw table directly
    stage_document_batches(
        spark, sf_dir, stage, n_files, dup_per_file=0,
        extra_cols=(group_col,),
    )

    schema = f"doc_id long, text string, {group_col} string"

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id and batch_id % compact_every == 0:
            # leaf rows are ROW-PRESERVING under the fold (merge
            # happens at read via per-bucket MAX), so the ingest
            # corpus's leveled compaction applies verbatim: a state
            # read opens O(log batches + compact_every) dirs over an
            # unbounded stream instead of one per trigger
            compact_ingest_state(batch.sparkSession, state, batch_id)
        leaf = hll_portable_sketch(batch, [group_col], "doc_id")
        # tiny frame (one row per group): single-file overwrite keyed
        # by batch id — the ingest corpus retry contract
        leaf.coalesce(1).write.mode("overwrite").parquet(
            f"{state}/batch_{batch_id:05d}"
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage, "batch_*"))
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    leaves = _read_batches(spark, state)
    assert leaves is not None, "sketch rollup produced no committed leaves"
    return hll_portable_estimate_from_leaves(leaves, [group_col])


def stream_quantile_rollup(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    group_col: str = "lang",
    value_col: str = "n_chars",
    probs: tuple[float, ...] = (0.5, 0.95, 0.99),
    n_files: int = 4,
    compact_every: int = 8,
) -> DataFrame:
    """The quantile member's streaming maintenance form: per-trigger
    log-bucketed histogram leaves into the at-rest summary, percentiles
    read from the merged buckets. Oracle-exact for the same reason as
    the HLL form — bucket counts are integers and SUM is associative +
    commutative, so the merged sketch (and the 6-dp-rounded midpoints)
    are a pure function of the arrived value multiset, independent of
    trigger decomposition and retries (per-batch-dir overwrite; n_rows
    reads the dir set). Returns (group, n_rows, p50, p95, p99)."""
    from pyspark.sql import functions as F

    from lookup_transform_spark.operators.sketches import (
        qsketch,
        qsketch_merge,
        qsketch_quantiles,
    )

    stage = os.path.join(work_dir, "arrivals")
    state = os.path.join(work_dir, "leaves")
    ckpt = os.path.join(work_dir, "ckpt")
    _reset_if_fixture_newer(spark, work_dir, stage, sf_dir)
    os.makedirs(state, exist_ok=True)
    stage_document_batches(
        spark, sf_dir, stage, n_files, dup_per_file=0,
        extra_cols=(group_col, value_col),
    )

    schema = f"doc_id long, text string, {group_col} string, {value_col} long"

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        if compact_every and batch_id and batch_id % compact_every == 0:
            compact_ingest_state(batch.sparkSession, state, batch_id)
        # log_bucket needs a double (isnan); the cast is mirrored in
        # the oracle's value expression
        leaf = qsketch(
            batch.withColumn(value_col, F.col(value_col).cast("double")),
            [group_col], value_col,
        )
        leaf.coalesce(1).write.mode("overwrite").parquet(
            f"{state}/batch_{batch_id:05d}"
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage, "batch_*"))
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    leaves = _read_batches(spark, state)
    assert leaves is not None, "quantile rollup produced no committed leaves"
    rolled = qsketch_merge(leaves, [group_col])
    out = qsketch_quantiles(rolled, [group_col], list(probs))
    qcols = [c for c in out.columns if c.startswith("p")]
    return out.select(
        group_col, "n_rows",
        *[F.round(c, 6).alias(c) for c in qcols],
    )
