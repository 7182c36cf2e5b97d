"""Streaming ingest with continuous dedup (B63 extension): the shape a
training-data pipeline actually runs — documents arrive in batches,
each batch is deduped within itself AND against everything already
accepted, survivors land in the corpus and their fingerprints join the
standing index so the NEXT batch sees them.

Structured Streaming expresses this as ``foreachBatch``: the stream
handles arrival/ordering/exactly-once bookkeeping, while each
micro-batch runs ordinary batch DataFrame logic — the same
fingerprint anti-join as ``dedup_incremental``, with per-batch cost
O(batch), never O(corpus). (Spark's built-in ``dropDuplicates`` on a
stream keeps ALL fingerprints in state-store memory forever; the
foreachBatch + at-rest-index formulation keeps the dedup state in a
parquet index instead — bounded executors, unbounded corpus. At 100 TB
the index is the bucketed layout of ``write_fingerprint_index``; the
demo appends plain parquet, which only changes the anti-join's shuffle,
not the semantics.)

Dedup rule: min doc_id per fingerprint WITHIN a batch; ACROSS batches
the first-accepted fingerprint wins (the index has no id to compare —
a later batch's row loses even if its doc_id is smaller). The corpus
therefore matches global min-id dedup under the usual ingest
precondition that re-sends/duplicates carry ids ≥ the original (true
of any monotonic id assignment, and of the staged fixture); under
out-of-order id arrival the set of deduped CONTENTS is still
batching-independent, only the surviving id differs.
``tests/test_streaming.py`` pins stream-ingest ≡ batch replay ≡ global
min-id dedup on such monotonic arrivals.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lookup_transform_spark.operators.text import content_fingerprint


def stage_document_batches(
    spark: SparkSession,
    sf_dir: str,
    stage_dir: str,
    n_files: int = 4,
    dup_per_file: int = 20,
) -> None:
    """Split the documents fixture into ``n_files`` arrival batches, and
    inject cross-batch duplicates: every batch after the first re-sends
    ``dup_per_file`` texts from the first batch under fresh (higher)
    doc_ids — the case continuous dedup exists for. Idempotent."""
    done = os.path.join(stage_dir, "_staged")
    if os.path.exists(done):
        return
    os.makedirs(stage_dir, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    first = docs.filter(F.col("doc_id") % n_files == 0)
    for i in range(n_files):
        part = docs.filter(F.col("doc_id") % n_files == i)
        if i > 0:
            dups = (
                first.orderBy("doc_id")
                .limit(dup_per_file)
                .withColumn(
                    "doc_id", F.col("doc_id") + F.lit(10_000_000 * i)
                )
            )
            part = part.unionByName(dups)
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stage_dir, f"batch_{i:02d}")
        )
    open(done, "w").write("ok")


def stream_ingest_dedup(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    n_files: int = 4,
) -> DataFrame:
    """Run the staged arrival batches through a foreachBatch ingest:
    within-batch min-id dedup → anti-join against the standing
    fingerprint index → survivors appended to corpus + index. Returns
    the final corpus (doc_id, f) as a batch DataFrame."""
    stage = os.path.join(work_dir, "arrivals")
    corpus = os.path.join(work_dir, "corpus")
    index = os.path.join(work_dir, "fp_index")
    ckpt = os.path.join(work_dir, "ckpt")
    # a REGENERATED fixture (newer than the staging marker) invalidates
    # the ENTIRE work dir — staged arrivals, corpus, index, and the
    # stream checkpoint age together (the same staleness rule the
    # at-rest IVF layout uses; a stale checkpoint would otherwise mark
    # the old files processed and return the old corpus silently)
    marker = os.path.join(stage, "_staged")
    fixture = os.path.join(sf_dir, "documents.parquet")
    if (
        os.path.exists(marker)
        and os.path.exists(fixture)
        and os.path.getmtime(fixture) > os.path.getmtime(marker)
    ):
        import shutil

        shutil.rmtree(work_dir, ignore_errors=True)
    for d in (corpus, index):
        os.makedirs(d, exist_ok=True)
    stage_document_batches(spark, sf_dir, stage, n_files)

    schema = "doc_id long, text string"

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        fp = batch.select(
            "doc_id", content_fingerprint("text").alias("f")
        )
        # within-batch: min id per fingerprint (deterministic survivor)
        local = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
        # against the standing index: only unseen fingerprints survive
        try:
            idx = s.read.parquet(index).select("f")
            has_idx = len(idx.take(1)) > 0
        except Exception:  # noqa: BLE001 — first batch, empty dir
            has_idx = False
        survivors = (
            local.join(idx, "f", "left_anti") if has_idx else local
        )
        survivors.select("doc_id", "f").write.mode("append").parquet(corpus)
        survivors.select("f").write.mode("append").parquet(index)

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
    return spark.read.parquet(corpus)
