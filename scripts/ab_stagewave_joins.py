"""A/B over the five >=1s >2x 32x floor-table joins (VERDICT r8 #2b):
tpch_q5 / tpch_q9 / q10_returned / tpch_q12 / join_anti.

Levers measured, per query, interleaved min-of-N on the 32x fixture:

- ``smj`` (shipped): the default sort-merge plan for the fact-fact
  orderkey join (dims broadcast, runtime filters, CBO order — the r6-r8
  levers are already in).
- ``shj``: ``spark.sql.join.preferSortMergeJoin=false`` — shuffled
  hash join for the fact-fact edge, skipping both sort passes. Same
  shuffle volume, less per-row CPU; the classic risk (build side must
  fit a task) is AQE-guarded.
- ``anti_distinct`` (join_anti only): partial-distinct the 19.2M
  lineitem keys map-side before the anti join, so the shuffle carries
  ~4.8M unique keys instead of every line row.

Results pasted into PLANS.md; a variant that wins >10% and holds at
128x gets shipped into the registry query.

Run: python scripts/ab_stagewave_joins.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from lookup_transform_spark import registry
from lookup_transform_spark.registry import _t
from lookup_transform_spark.session import get_spark
from probe_common import time_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_DIR = f"{REPO}/.scratch/scale32"
REPEATS = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "4"))

QUERIES = [
    "tpch_q5_local_supplier",
    "tpch_q9_profit",
    "q10_returned",
    "tpch_q12_late_priority",
    "join_anti",
]


def _with_conf(spark, key, value, fn):
    def run(s, sf_dir):
        prev = s.conf.get(key, None)
        s.conf.set(key, value)
        try:
            return fn(s, sf_dir)
        finally:
            if prev is None:
                s.conf.unset(key)
            else:
                s.conf.set(key, prev)
    return run


def anti_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return o.join(
        li, o["o_orderkey"] == li["l_orderkey"], "left_anti"
    ).select("o_orderkey")


def main() -> None:
    spark = get_spark("ab-stagewave")
    if os.environ.get("SPARK_GRAFT_BENCH_STATS", "1") != "0":
        from lookup_transform_spark import stats

        stats.register_stats_tables(spark, SCALE_DIR)
        stats.enable_cbo(spark, application_side_threshold="10MB")
    out: dict = {}
    for name in QUERIES:
        base = registry.QUERIES[name]
        variants = {
            "smj": base,
            "shj": _with_conf(
                spark, "spark.sql.join.preferSortMergeJoin", "false", base
            ),
        }
        if name == "join_anti":
            variants["anti_distinct"] = anti_distinct
        # correctness gate: every variant returns identical rows
        ref = sorted(tuple(r) for r in base(spark, SCALE_DIR).collect())
        for vn, fn in variants.items():
            if vn == "smj":
                continue
            got = sorted(tuple(r) for r in fn(spark, SCALE_DIR).collect())
            assert got == ref, f"{name}:{vn} disagrees with shipped plan"
        samples: dict[str, list] = {k: [] for k in variants}
        for _ in range(REPEATS):
            for vn, fn in variants.items():
                r = time_spark(spark, fn, f"{name}:{vn}", SCALE_DIR,
                               timeout=240, repeats=1)
                if "sec" in r:
                    samples[vn].append(round(r["sec"], 3))
        out[name] = {
            vn: {"min_sec": min(ss), "samples": ss}
            for vn, ss in samples.items() if ss
        }
        print(name, {vn: v["min_sec"] for vn, v in out[name].items()},
              file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
