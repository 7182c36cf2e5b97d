"""A/B: the empty-frame global-window scalar-threshold shapes (TPC-H
Q11/Q15) vs a checkpoint + scalar-aggregate broadcast formulation
(VERDICT r8 #6), at 32x and 128x.

The registered queries compute their global scalar (avg part value;
max supplier revenue) as an empty-frame window over the per-key
aggregate — ONE fact scan, but ``Window.partitionBy()`` funnels all
per-key rows through a single partition (the WindowExec warning in
every bench log). The alternative here keeps the single fact scan by
``localCheckpoint``-ing the per-key aggregate (|parts| / |suppliers|
rows — small relative to the fact table at any scale), then computes
the scalar as a 1-row aggregate broadcast-cross-joined back: no
single-partition window, one extra small materialization.

Run: python scripts/ab_global_window.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from lookup_transform_spark import registry
from lookup_transform_spark.functions.fixedpoint import scaled_long
from lookup_transform_spark.registry import _fsum, _t
from lookup_transform_spark.session import get_spark
from probe_common import time_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# 128x facts live in the bloom128 fixture (4 key-shifted copies of
# scale32's orders/lineitem + 1x dims), the same one the relational
# tier of scaling128_probe reads
FIXTURES = {
    "32x": f"{REPO}/.scratch/scale32",
    "128x": f"{REPO}/.scratch/bloom128",
}
REPEATS = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "4"))


def q11_scalar(spark, sf):
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_extendedprice")
    per_part = li.groupBy("l_partkey").agg(
        _fsum("l_extendedprice", "part_value", dp=2)
    ).localCheckpoint()
    stats = per_part.agg(
        F.sum(scaled_long("part_value", 2)).alias("__s__"),
        F.count(F.lit(1)).alias("__n__"),
    )
    return (
        per_part.crossJoin(F.broadcast(stats))
        .filter(
            F.col("part_value")
            > 1.3 * (F.col("__s__") / 100.0) / F.col("__n__")
        )
        .select("l_partkey", "part_value")
    )


def q15_scalar(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _fsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue", dp=4,
            )
        )
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev__"))
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max_rev__"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def main() -> None:
    spark = get_spark("ab-global-window")
    cases = {
        "q11": (registry.QUERIES["tpch_q11_value_conc"], q11_scalar),
        "q15": (registry.QUERIES["tpch_q15_top_supplier"], q15_scalar),
    }
    out: dict = {}
    for label, sf_dir in FIXTURES.items():
        if not os.path.exists(f"{sf_dir}/_done"):
            print(f"skip {label}: fixture missing", file=sys.stderr)
            continue
        for qname, (v_window, v_scalar) in cases.items():
            a = sorted(tuple(r) for r in v_window(spark, sf_dir).collect())
            b = sorted(tuple(r) for r in v_scalar(spark, sf_dir).collect())
            assert a == b, f"{qname}@{label}: variants disagree"
            samples = {"window": [], "scalar_broadcast": []}
            for _ in range(REPEATS):
                for vn, fn in (("window", v_window), ("scalar_broadcast", v_scalar)):
                    r = time_spark(spark, fn, f"{qname}:{vn}", sf_dir,
                                   timeout=240, repeats=1)
                    if "sec" in r:
                        samples[vn].append(round(r["sec"], 3))
            out[f"{qname}@{label}"] = {
                vn: {"min_sec": min(ss), "samples": ss}
                for vn, ss in samples.items() if ss
            }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
