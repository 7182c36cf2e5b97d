"""Interleaved A/B for the r10 ingest write fusion (VERDICT r9 #2).

The r9 ingest paid 2 write jobs per micro-batch on the exact tier
(accepted docs + fingerprint index) and 3 on the near tier (+ LSH
bands), each a separate Spark action over the same checkpointed batch
frame. r10 derives the fingerprint index from the corpus (column-pruned
``select("f")`` over the corpus batch dirs), cutting one write wave per
batch and one full compaction stream.

This script measures exactly that delta, drift-robust: both variants
run the SAME staged arrival batches through the SAME replay loop — the
only difference is whether each batch also writes a separate
fingerprint-index dir (the old layout) — interleaved one repeat each
per round, min-of-N reported. The oracle-visible output (the corpus)
is asserted identical between variants every round.

Run: python scripts/ab_ingest_fusion.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lookup_transform_spark.operators.text import content_fingerprint  # noqa: E402
from lookup_transform_spark.session import get_spark  # noqa: E402
from lookup_transform_spark.streaming.ingest import (  # noqa: E402
    _materialize_batch,
    _read_batches,
    compact_ingest_state,
    stage_document_batches,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEATS = int(os.environ.get("AB_REPEATS", "5"))
N_FILES = int(os.environ.get("AB_N_FILES", "8"))


def replay(spark, stage_dirs, root: str, split_index: bool,
           compact_every: int = 8) -> set:
    """The exact-tier ingest step over pre-staged batches; when
    ``split_index`` the old separate fingerprint-index write/compaction
    runs too (the r9 behavior)."""
    corpus = os.path.join(root, "corpus")
    index = os.path.join(root, "fp_index")
    os.makedirs(corpus, exist_ok=True)
    if split_index:
        os.makedirs(index, exist_ok=True)
    for bid, bdir in enumerate(stage_dirs):
        batch = spark.read.parquet(bdir)
        if compact_every and bid and bid % compact_every == 0:
            compact_ingest_state(spark, corpus, bid)
            if split_index:
                compact_ingest_state(spark, index, bid)
        fp = batch.select("doc_id", content_fingerprint("text").alias("f"))
        local = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
        idx = _read_batches(
            spark, index if split_index else corpus, before=bid
        )
        survivors = (
            local.join(idx.select("f"), "f", "left_anti")
            if idx is not None else local
        )
        tag = f"batch_{bid:05d}"
        survivors, files = _materialize_batch(
            survivors.select("doc_id", "f"), batch.rdd.getNumPartitions()
        )
        survivors.coalesce(files).write.mode("overwrite").parquet(
            f"{corpus}/{tag}"
        )
        if split_index:
            survivors.select("f").coalesce(files).write.mode(
                "overwrite"
            ).parquet(f"{index}/{tag}")
    out = _read_batches(spark, corpus)
    return {(r["f"], r["doc_id"]) for r in out.collect()}


def main() -> None:
    spark = get_spark("ab-ingest-fusion")
    work = "/tmp/ab_ingest_fusion"
    shutil.rmtree(work, ignore_errors=True)
    stage = os.path.join(work, "arrivals")
    stage_document_batches(spark, SF_DIR, stage, N_FILES)
    stage_dirs = sorted(
        os.path.join(stage, d) for d in os.listdir(stage)
        if d.startswith("batch_")
    )
    samples = {"fused": [], "split": []}
    expect = None
    for _ in range(REPEATS):
        for variant in ("fused", "split"):
            root = os.path.join(work, variant)
            shutil.rmtree(root, ignore_errors=True)
            t0 = time.perf_counter()
            got = replay(spark, stage_dirs, root, variant == "split")
            samples[variant].append(time.perf_counter() - t0)
            if expect is None:
                expect = got
            assert got == expect, f"variant {variant} diverged"
    out = {
        "sf_dir": SF_DIR,
        "n_batches": len(stage_dirs),
        "repeats": REPEATS,
        "corpus_rows": len(expect),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    for v, ss in samples.items():
        out[v] = {"min_sec": round(min(ss), 3),
                  "samples": [round(s, 3) for s in ss]}
    out["saving_pct"] = round(
        100 * (1 - out["fused"]["min_sec"] / out["split"]["min_sec"]), 1
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
