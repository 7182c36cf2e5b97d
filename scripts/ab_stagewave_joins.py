"""A/B over the five >=1s >2x 32x floor-table joins (VERDICT r8 #2b):
tpch_q5 / tpch_q9 / q10_returned / tpch_q12 / join_anti.

Levers measured, per query, interleaved min-of-N on the 32x fixture:

- ``smj`` (shipped): the default sort-merge plan for the fact-fact
  orderkey join (dims broadcast, runtime filters, CBO order — the
  r6-r8 levers are already in).
- ``shj``: the same query with a ``SHUFFLE_HASH`` join hint on the
  orders side of the fact-fact edge, skipping both sort passes.
  (The first r9 cut toggled ``spark.sql.join.preferSortMergeJoin``
  around the BUILD only — the conf was restored before execution, so
  that arm silently measured sort-merge against itself; and even held
  through execution, the conf never flips these plans because the
  orders side fails JoinSelection's ``muchSmaller``/local-hash-map
  size gates at this scale. The HINT forces the strategy
  deterministically, and a plan assertion now fails the arm loudly if
  the intended join node is absent — r9 self-review.)
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
from lookup_transform_spark.functions.fixedpoint import scaled_long
from lookup_transform_spark.registry import _fsum, _t
from lookup_transform_spark.session import get_spark
from probe_common import time_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_DIR = f"{REPO}/.scratch/scale32"
REPEATS = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "4"))


# --- shj variants: measurement twins of the registry queries with a
# SHUFFLE_HASH hint on the orders side of the fact-fact orderkey edge;
# the correctness gate below asserts row equality with the shipped
# query, and the plan gate asserts the hint actually took.

def shj_q5(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").hint("shuffle_hash")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(_fsum(revenue, "revenue", dp=4))
    )


def shj_q9(spark, sf):
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate"
    ).hint("shuffle_hash")
    p = (
        _t(spark, sf, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    amount = scaled_long(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ) - scaled_long(0.1 * F.col("p_retailprice") * F.col("l_quantity"), 6)
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("amount") / F.lit(1e6)).alias("profit"))
    )


def shj_q10(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").hint("shuffle_hash")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_fsum(revenue, "revenue", dp=4))
    )


def shj_q12(spark, sf):
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).hint("shuffle_hash")
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def shj_anti(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").hint("shuffle_hash")
    return o.join(
        li, o["o_orderkey"] == li["l_orderkey"], "left_anti"
    ).select("o_orderkey")


def anti_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return o.join(
        li, o["o_orderkey"] == li["l_orderkey"], "left_anti"
    ).select("o_orderkey")


CASES = {
    "tpch_q5_local_supplier": shj_q5,
    "tpch_q9_profit": shj_q9,
    "q10_returned": shj_q10,
    "tpch_q12_late_priority": shj_q12,
    "join_anti": shj_anti,
}


def main() -> None:
    spark = get_spark("ab-stagewave")
    if os.environ.get("SPARK_GRAFT_BENCH_STATS", "1") != "0":
        from lookup_transform_spark import stats

        stats.register_stats_tables(spark, SCALE_DIR)
        stats.enable_cbo(spark, application_side_threshold="10MB")
    out: dict = {}
    for name, shj_fn in CASES.items():
        base = registry.QUERIES[name]
        variants = {"smj": base, "shj": shj_fn}
        if name == "join_anti":
            variants["anti_distinct"] = anti_distinct
        # plan gate: the hinted arm must actually contain the intended
        # join node (the r9 self-review found the conf-toggle arm
        # silently measuring the control)
        plan = shj_fn(spark, SCALE_DIR)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "ShuffledHashJoin" in plan, (
            f"{name}: SHUFFLE_HASH hint did not produce a shj node"
        )
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
