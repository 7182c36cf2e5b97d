"""Decompose the sf0.1 per-query fixed-cost floor (VERDICT r9 #1).

105 of the 109 over-2x comparables at sf0.1 are SUB-SECOND engine
queries losing to a millisecond DuckDB oracle; a modeled flat -0.15 s
per query would flip within-2x from 33 to 83 (BENCH_DETAIL r9). This
script answers WHERE that constant goes and WHICH config knobs move it,
with the bench's own protocol (warm session, interleaved repeats, min
estimator — the drift discipline from PLANS.md r5).

Three sections, one JSON artifact (FLOOR_PROFILE.json):

A. microbench — the irreducible job floor on this box: empty-plan
   noop write, 1-stage scan+agg, 2-stage shuffle agg, parquet
   schema-read cost, py4j round-trip cost. These bound what ANY config
   can reach.
B. decompose — for a representative slice of the sub-second >2x set,
   split wall time into plan-BUILD (the Python fn call: py4j chatter +
   analysis) and EXECUTE (noop write: jobs, shuffles, AQE stages).
   Build time is driver-side Python/py4j — a constant no cluster ever
   sees at scale; execute time is the Spark scheduler's floor.
C. config A/B — interleaved min-of-N over the slice for each candidate
   conf delta (AQE off, shuffle=8, both, parallelismFirst=false,
   codegen-stage-cap), all runtime-settable so one session serves all
   variants without cold-start bias. Every variant is restored to base
   between samples.

Run: python scripts/floor_profile.py [sf_dir] (default sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lookup_transform_spark import registry  # noqa: E402
from lookup_transform_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEATS = int(os.environ.get("FLOOR_REPEATS", "7"))

# The decomposition slice: sub-second >2x comparables spanning the
# query families (scan-agg, window, join, sketch, text, set-op, asof).
SLICE = [
    "tpch_q1",
    "agg_distinct",
    "sketch_quantile_rollup",
    "lookup_asof_nearest",
    "setops_except_all",
    "tpch_q3_shipping",
    "substring_dup_rate",
    "knn_classify",
    "window_running",
    "lookup",
]

# Candidate conf deltas (all runtime-settable; applied per-variant and
# restored to base after each sample). Each entry: name -> dict of
# conf -> value.
VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "shuffle8": {"spark.sql.shuffle.partitions": "8"},
    "aqe_off_shuffle8": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    },
    # keep AQE but stop it spreading tiny shuffles over max parallelism
    "aqe_size_first": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8MB",
    },
}


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _base_confs(spark) -> dict[str, str]:
    keys = set()
    for d in VARIANTS.values():
        keys.update(d)
    out = {}
    for k in keys:
        try:
            out[k] = spark.conf.get(k)
        except Exception:
            out[k] = None
    return out


def microbench(spark) -> dict:
    """Irreducible floors: what does the scheduler charge for nothing?"""
    out: dict[str, float] = {}

    def best(fn, n=REPEATS):
        ss = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ss.append(time.perf_counter() - t0)
        return round(min(ss), 4)

    import pyspark.sql.functions as F

    # pure py4j round trip (no job)
    out["py4j_roundtrip_sec"] = best(
        lambda: spark.conf.get("spark.sql.shuffle.partitions"), 50
    )
    # empty-ish job: 1-partition range noop write
    out["noop_1part_sec"] = best(
        lambda: _run(spark.range(1).coalesce(1))
    )
    # 32-task single-stage job
    out["noop_32part_sec"] = best(
        lambda: _run(spark.range(1_000_000, numPartitions=32))
    )
    # 1-stage scan+filter+project over the biggest fixture
    li = f"{SF_DIR}/lineitem.parquet"
    sch = spark.read.parquet(li).schema
    out["scan_1stage_sec"] = best(
        lambda: _run(
            spark.read.schema(sch)
            .parquet(li)
            .select("l_orderkey", "l_quantity")
            .filter(F.col("l_quantity") > 49)
        )
    )
    # 2-stage shuffle agg over the same scan
    out["scan_2stage_shuffle_sec"] = best(
        lambda: _run(
            spark.read.schema(sch)
            .parquet(li)
            .groupBy("l_returnflag")
            .agg(F.sum("l_quantity").alias("s"))
        )
    )
    # parquet footer/schema read (driver-side, what _t pays without the
    # stats catalog)
    out["schema_read_sec"] = best(lambda: spark.read.parquet(li).schema, 20)
    # plan-build-only for a mid-size query (analysis + py4j, no job)
    fn = registry.QUERIES["tpch_q1"]
    out["tpch_q1_build_only_sec"] = best(
        lambda: fn(spark, SF_DIR).schema, 10
    )
    return out


def decompose(spark) -> dict:
    """Per-query build vs execute split over the slice."""
    out: dict[str, dict] = {}
    for name in SLICE:
        fn = registry.QUERIES[name]
        builds, execs, walls = [], [], []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            _run(df)
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            walls.append(t2 - t0)
        out[name] = {
            "build_min_sec": round(min(builds), 4),
            "exec_min_sec": round(min(execs), 4),
            "wall_min_sec": round(min(walls), 4),
            "build_share": round(min(builds) / min(walls), 3),
        }
    return out


def config_ab(spark) -> dict:
    """Interleaved A/B over the slice: one repeat of every (variant,
    query) pair per round so host drift hits all variants equally."""
    base = _base_confs(spark)

    def apply(deltas: dict[str, str]):
        for k, v in base.items():
            tgt = deltas.get(k, v)
            if tgt is not None:
                spark.conf.set(k, tgt)

    samples: dict[str, dict[str, list]] = {
        v: {q: [] for q in SLICE} for v in VARIANTS
    }
    for _ in range(REPEATS):
        for vname, deltas in VARIANTS.items():
            apply(deltas)
            for q in SLICE:
                fn = registry.QUERIES[q]
                t0 = time.perf_counter()
                _run(fn(spark, SF_DIR))
                samples[vname][q].append(time.perf_counter() - t0)
    apply({})  # restore base
    out: dict[str, dict] = {}
    for vname, per_q in samples.items():
        mins = {q: round(min(ss), 4) for q, ss in per_q.items()}
        out[vname] = {"per_query_min": mins,
                      "total_sec": round(sum(mins.values()), 4)}
    return out


def main() -> None:
    spark = get_spark("floor-profile")
    from lookup_transform_spark import stats

    # mirror the bench protocol: stats catalog + CBO registered outside
    # any timed window
    stats.register_stats_tables(spark, SF_DIR)
    stats.enable_cbo(spark, application_side_threshold="10MB")
    _run(registry.QUERIES["lookup"](spark, SF_DIR))  # warmup

    result = {
        "sf_dir": SF_DIR,
        "repeats": REPEATS,
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "microbench": microbench(spark),
        "decompose": decompose(spark),
        "config_ab": config_ab(spark),
    }
    result["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FLOOR_PROFILE.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["microbench"], indent=1))
    print(json.dumps({v: d["total_sec"] for v, d in result["config_ab"].items()}, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
