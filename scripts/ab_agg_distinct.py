"""A/B: agg_distinct's Expand plan vs manual partial-distinct
pre-aggregation (VERDICT r8 #2a), on the 32x fixture.

Two exact COUNT(DISTINCT) over one GROUP BY compile to
Expand(x3 rows) + two-phase aggregate — every input row is tripled
before any reduction. The alternative: answer each distinct count from
its own pre-deduplicated (group, key) pair set — `distinct` is itself
two-phase (map-side partial), so the shuffle carries unique pairs, not
tripled rows — then stitch the three tiny per-group results with
broadcast joins. Interleaved repeats, same session, min-of-N per
variant; results pasted into PLANS.md.

Run: python scripts/ab_agg_distinct.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from lookup_transform_spark.session import get_spark
from probe_common import time_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_DIR = f"{REPO}/.scratch/scale32"
REPEATS = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "5"))


def v_expand(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def v_predistinct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d1 = (
        li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_parts"))
    )
    d2 = (
        li.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_supps"))
    )
    d3 = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))
    return d3.join(F.broadcast(d1), "l_returnflag").join(
        F.broadcast(d2), "l_returnflag"
    ).select("l_returnflag", "n_parts", "n_supps", "n_rows")


def main() -> None:
    spark = get_spark("ab-agg-distinct")
    if not os.path.exists(f"{SCALE_DIR}/_done"):
        raise SystemExit("32x fixture missing — run scripts/scaling_probe.py first")
    # correctness gate before timing
    a = sorted(tuple(r) for r in v_expand(spark, SCALE_DIR).collect())
    b = sorted(tuple(r) for r in v_predistinct(spark, SCALE_DIR).collect())
    assert a == b, f"variants disagree: {a[:2]} vs {b[:2]}"
    out = {}
    variants = {"expand": v_expand, "predistinct": v_predistinct}
    # interleaved: one repeat of each per round, so load drift hits
    # both variants equally
    samples: dict[str, list] = {k: [] for k in variants}
    for _ in range(REPEATS):
        for name, fn in variants.items():
            r = time_spark(spark, fn, f"agg_distinct:{name}", SCALE_DIR,
                           timeout=240, repeats=1)
            if "sec" in r:
                samples[name].append(r["sec"])
    for name, ss in samples.items():
        if not ss:
            # every repeat timed out — record the marker instead of
            # raising on min([]) and losing the other variant's data
            out[name] = {"min_sec": None, "samples": [], "all_timed_out": True}
            continue
        out[name] = {"min_sec": round(min(ss), 3), "samples": [round(s, 3) for s in ss]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
