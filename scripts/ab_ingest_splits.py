"""Time the ingest's PARALLEL arm (VERDICT r9 #5).

The r9 adaptive rule (`_materialize_batch`: per-batch compute
parallelism = the batch's own input-split count) was A/B-measured in
the serializing direction — a one-split batch runs 37% faster
serialized — but the parallel arm (a batch spanning MANY input splits
keeps its parallelism) was only partition-count-pinned, never timed.
This script measures it: the 32×-docs fixture staged as 4 arrival
batches (~40k docs each), each batch REWRITTEN as 12 parquet splits
(same rows — the multi-million-doc arrival shape), replayed through
the near-dup ingest step under

- adaptive (shipped): input has 12 splits → compute runs 12-wide
- serialized (the pre-r9 behavior, forced coalesce(1)): the whole
  anti-join/LSH-probe of every batch collapses to one task

interleaved min-of-N, corpus outputs asserted identical. A win for
adaptive here plus the r9 one-split table is the full two-sided proof
of the rule.

Run: python scripts/ab_ingest_splits.py [docs32_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lookup_transform_spark.session import get_spark  # noqa: E402
from lookup_transform_spark.streaming import ingest as ing  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.scratch/scale32"
REPEATS = int(os.environ.get("AB_REPEATS", "2"))
N_SPLITS = 12
N_FILES = 4


def stage_multisplit(spark, single_stage: str, multi_stage: str) -> None:
    """Rewrite each staged arrival batch as N_SPLITS parquet files —
    same rows, multi-split arrival shape."""
    if os.path.exists(os.path.join(multi_stage, "_staged")):
        return
    os.makedirs(multi_stage, exist_ok=True)
    for d in sorted(os.listdir(single_stage)):
        if not d.startswith("batch_"):
            continue
        spark.read.parquet(os.path.join(single_stage, d)).repartition(
            N_SPLITS
        ).write.mode("overwrite").parquet(os.path.join(multi_stage, d))
    open(os.path.join(multi_stage, "_staged"), "w").write("ok")


def replay(spark, stage: str, root: str, serialized: bool) -> tuple[set, list]:
    lsh_table = ing._lsh_table_prefix(root)
    spark.sql(f"DROP TABLE IF EXISTS {lsh_table}_bands")
    spark.sql(f"DROP TABLE IF EXISTS {lsh_table}_docs")
    corpus = os.path.join(root, "corpus")
    os.makedirs(corpus, exist_ok=True)
    orig = ing._materialize_batch
    if serialized:
        ing._materialize_batch = lambda df, parts: orig(df, 1)
    per_batch = []
    try:
        for bid, b in enumerate(
            sorted(d for d in os.listdir(stage) if d.startswith("batch_"))
        ):
            t0 = time.perf_counter()
            ing.ingest_batch_neardedup(
                spark.read.parquet(os.path.join(stage, b)), bid,
                corpus, lsh_table, os.path.join(root, "lsh_index"),
            )
            per_batch.append(round(time.perf_counter() - t0, 2))
    finally:
        ing._materialize_batch = orig
        spark.sql(f"DROP TABLE IF EXISTS {lsh_table}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {lsh_table}_docs")
    rows = {
        (r["f"], r["doc_id"])
        for r in ing._read_batches(spark, corpus).collect()
    }
    return rows, per_batch


def main() -> None:
    spark = get_spark("ab-ingest-splits")
    work = "/tmp/ab_ingest_splits"
    single = os.path.join(work, "arrivals_1file")
    multi = os.path.join(work, "arrivals_12split")
    ing.stage_document_batches(
        spark, SRC, single, N_FILES, dup_per_file=10, near_per_file=10
    )
    stage_multisplit(spark, single, multi)

    samples: dict[str, list] = {"adaptive": [], "serialized": []}
    batches: dict[str, list] = {}
    expect = None
    for _ in range(REPEATS):
        for variant in ("adaptive", "serialized"):
            root = os.path.join(work, variant)
            shutil.rmtree(root, ignore_errors=True)
            t0 = time.perf_counter()
            rows, per_batch = replay(
                spark, multi, root, variant == "serialized"
            )
            samples[variant].append(time.perf_counter() - t0)
            batches[variant] = per_batch
            if expect is None:
                expect = rows
            assert rows == expect, f"{variant} diverged"
    out = {
        "fixture": SRC,
        "n_batches": N_FILES,
        "splits_per_batch": N_SPLITS,
        "repeats": REPEATS,
        "corpus_rows": len(expect),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    for v, ss in samples.items():
        out[v] = {
            "total_min_sec": round(min(ss), 2),
            "samples": [round(s, 2) for s in ss],
            "per_batch_last_rep_sec": batches[v],
        }
    out["adaptive_saving_pct"] = round(
        100 * (1 - out["adaptive"]["total_min_sec"]
               / out["serialized"]["total_min_sec"]), 1,
    )
    print(json.dumps(out, indent=1))
    with open(f"{REPO}/INGEST_SPLITS_AB.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
