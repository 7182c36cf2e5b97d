"""Config A/B for the sf0.1 per-query fixed-cost floor (VERDICT r9 #1).

FLOOR_PROFILE.json decomposed the sub-second >2x mass: ~0.05 s/job
scheduling + ~0.07-0.1 s per AQE-materialized stage + driver-side
py4j plan-build, with whole-stage compute in the low milliseconds.
This script measures the two runtime-settable knobs that attack the
stage term, over a 23-query slice spanning the flippable 2-8x band,
at BOTH the graded sf (sf0.1) and the 32x fixture (no-regression
check, heavies included):

- shuffle8:          spark.sql.shuffle.partitions 32 -> 8 (AQE on)
- aqe_off_shuffle8:  both — static plans, no per-stage job waves

Protocol: bench's own (warm session, stats catalog + CBO, noop-write
sink), interleaved one repeat of every (variant, query) pair per round
so host drift hits all variants equally, min-of-N per pair. Writes
FLOOR_AB.json.

Run: python scripts/ab_floor_policy.py [--32x]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lookup_transform_spark import registry  # noqa: E402
from lookup_transform_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPEATS = int(os.environ.get("FLOOR_AB_REPEATS", "5"))

SLICE_SF01 = [
    "tpch_q1", "tpch_q3_shipping", "q7_volume_shipping", "q18_volume",
    "tpch_q18_large_volume", "q10_returned", "agg_distinct", "agg_corr",
    "setops_except_all", "lookup_asof_nearest", "lookup_asof_tolerance",
    "sketch_quantile_rollup", "sketch_topk_rollup", "knn_classify",
    "substring_dup_rate", "dedup_substring", "decontaminate",
    "tfidf_top_terms", "lookup", "window_running", "lang_id",
    "text_stats", "sessionize",
]
# 32x no-regression slice: the floor-table heavies whose plans AQE
# actively shapes (stage coalescing, broadcast conversion, skew) —
# exactly the queries a small-input policy must NOT touch at scale
SLICE_32X = [
    "tpch_q1", "tpch_q3_shipping", "q10_returned", "tpch_q12",
    "agg_distinct", "join_anti", "dedup_exact", "lookup",
]

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "shuffle8": {"spark.sql.shuffle.partitions": "8"},
    "aqe_off_shuffle8": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    },
}


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    at_32x = "--32x" in sys.argv
    sf_dir = (
        os.path.join(REPO, ".scratch", "scale32")
        if at_32x else "/root/testdata/sf0.1"
    )
    queries = SLICE_32X if at_32x else SLICE_SF01
    spark = get_spark("ab-floor-policy")
    from lookup_transform_spark import stats

    stats.register_stats_tables(spark, sf_dir)
    stats.enable_cbo(spark, application_side_threshold="10MB")
    _run(registry.QUERIES["lookup"](spark, sf_dir))

    base = {}
    keys = {k for d in VARIANTS.values() for k in d}
    for k in keys:
        base[k] = spark.conf.get(k)

    def apply(deltas: dict[str, str]):
        for k, v in base.items():
            spark.conf.set(k, deltas.get(k, v))

    samples = {v: {q: [] for q in queries} for v in VARIANTS}
    for _ in range(REPEATS):
        for vname, deltas in VARIANTS.items():
            apply(deltas)
            for q in queries:
                t0 = time.perf_counter()
                _run(registry.QUERIES[q](spark, sf_dir))
                samples[vname][q].append(time.perf_counter() - t0)
    apply({})

    out = {
        "sf_dir": sf_dir,
        "repeats": REPEATS,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "variants": {},
    }
    for vname, per_q in samples.items():
        mins = {q: round(min(ss), 4) for q, ss in per_q.items()}
        out["variants"][vname] = {
            "per_query_min": mins,
            "total_sec": round(sum(mins.values()), 4),
        }
    path = os.path.join(
        REPO, "FLOOR_AB_32X.json" if at_32x else "FLOOR_AB.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    for vname, d in out["variants"].items():
        print(vname, d["total_sec"])
    print("wrote", path)


if __name__ == "__main__":
    main()
