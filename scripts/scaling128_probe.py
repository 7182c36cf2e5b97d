"""Heavy-tier scaling probe at 128x derived scale (VERDICT r5 #4).

The 100 TB claims for the dedup/ANN/clustering family rested on
19.2M-row (32x) evidence; this probe runs that family at 128x —
documents/embeddings/lineitem four more key-shifted copies of the
scale32 fixture (same construction: per-copy text tags keep near-dup
families non-byte-identical, key shifts keep ids unique) — and records
per-query seconds at 32x and 128x so growth curves are visible.
Sublinear growth in the per-row sense (time ratio < 4x for 4x rows)
is the pass criterion the artifact exposes.

Only the heavy tier runs: these are the operators whose cost is
dominated by data volume, not by Spark's fixed per-query floor, so
128x/32x ratios measure the algorithms, not the scheduler.

Run: python scripts/scaling128_probe.py [--skip-build]
Writes SCALING128.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lookup_transform_spark import registry
from lookup_transform_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE32 = f"{REPO}/.scratch/scale32"
OUT = f"{REPO}/.scratch/scale128"
SPARK_TIMEOUT = float(os.environ.get("SPARK_GRAFT_PROBE_TIMEOUT", "600"))
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "2"))

# the volume-dominated family (VERDICT r5 #4 names) — each reads
# documents and/or embeddings, whose row counts this probe scales
HEAVY = [
    "dedup_minhash",
    "dedup_simhash",
    "ngram_jaccard",
    "embedding_near_dup",
    "dedup_clusters",
    "dedup_semantic",
    "kmeans_embeddings",
    "simsearch_ivf",
    "simsearch_ivf_pruned",
    "dedup_incremental_indexed",
    "dedup_incremental_minhash",
]

# the heavy tier reads ONLY documents/embeddings; dims are copied so
# _t never dangles, relational fact tables are deliberately absent
# (a heavy-tier query reaching for one should fail loudly, not probe
# a silently-stale copy)
SCALED = ("documents", "embeddings")
COPIED = ("region", "nation", "customer", "supplier", "part")


def build_scaled(spark) -> None:
    """scale128 = 4 key-shifted copies of scale32 (which is itself 32
    key-shifted copies of sf0.1), so every id stays unique and each
    32x near-dup family becomes a 128-doc family."""
    if os.path.exists(f"{OUT}/_done"):
        return
    if not os.path.exists(f"{BASE32}/_done"):
        raise SystemExit("scale32 fixture missing — run scaling_probe.py first")
    os.makedirs(OUT, exist_ok=True)
    shifts = {
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
    }
    for table in SCALED:
        df = spark.read.parquet(f"{BASE32}/{table}.parquet")
        keys = shifts[table]
        maxes = df.agg(*[F.max(k) for k in keys]).collect()[0]
        steps = [m + 1 for m in maxes]
        big = None
        for i in range(4):
            part = df
            for k, step in zip(keys, steps):
                part = part.withColumn(k, F.col(k) + F.lit(i * step))
            if table == "documents" and i:
                part = part.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" d{i}"))
                ).withColumn(
                    "n_chars", F.col("n_chars") + F.lit(len(f" d{i}"))
                )
            big = part if big is None else big.unionByName(part)
        n_out = {"documents": 32, "embeddings": 16}.get(table, 32)
        big.repartition(n_out).write.mode("overwrite").parquet(
            f"{OUT}/{table}.parquet"
        )
        print(f"built {table} x128", flush=True)
    for t in COPIED:
        shutil.copyfile(f"{BASE32}/{t}.parquet", f"{OUT}/{t}.parquet")
    open(f"{OUT}/_done", "w").write("ok")


def time_spark(spark, name: str, sf_dir: str) -> dict:
    best, err = None, None
    for _ in range(REPEATS):
        result: dict = {}

        def target():
            spark.sparkContext.setJobGroup(
                "probe128", name, interruptOnCancel=True
            )
            t0 = time.perf_counter()
            try:
                df = registry.QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                result["sec"] = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                result["err"] = f"{type(e).__name__}: {e}"[:200]

        th = threading.Thread(target=target, daemon=True)
        th.start()
        th.join(SPARK_TIMEOUT)
        if th.is_alive():
            spark.sparkContext.cancelJobGroup("probe128")
            th.join(30)
            return {"timeout": SPARK_TIMEOUT}
        if "err" in result:
            err = result["err"]
            break
        best = result["sec"] if best is None else min(best, result["sec"])
    if err:
        return {"err": err}
    return {"sec": round(best, 3)}


def main() -> None:
    spark = get_spark("scaling128-probe")
    if "--skip-build" not in sys.argv:
        build_scaled(spark)
    results: dict[str, dict] = {}
    for label, sf_dir in (("32x", BASE32), ("128x", OUT)):
        for name in HEAVY:
            rec = results.setdefault(name, {})
            rec[f"spark_{label}"] = time_spark(spark, name, sf_dir)
            print(
                f"[{label}] {name:28s} "
                f"spark={rec[f'spark_{label}'].get('sec', rec[f'spark_{label}'])}",
                flush=True,
            )
    for name, rec in results.items():
        a = rec.get("spark_32x", {}).get("sec")
        b = rec.get("spark_128x", {}).get("sec")
        if a and b:
            rec["growth_128_over_32"] = round(b / a, 2)
    out = {
        "scale": 128,
        "base": "scale32 x 4 key-shifted copies (dims 1x)",
        "rows_128x": {"documents_vs_sf0.1": 128},
        "spark_timeout_sec": SPARK_TIMEOUT,
        "repeats": REPEATS,
        "estimator": "min",
        "loadavg": list(os.getloadavg()),
        "note": (
            "4x rows from 32x to 128x; growth_128_over_32 < 4 means "
            "sublinear per-row growth (the heavy tier's scale claim)"
        ),
        "queries": results,
    }
    with open(f"{REPO}/SCALING128.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING128.json")


if __name__ == "__main__":
    main()
