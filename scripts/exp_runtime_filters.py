"""Experiment: can CBO stats + runtime bloom filters / SHJ / broadcast
sizing pull the fact-fact TPC-H tail under 2x DuckDB at 32x?

Times tpch_q5/q7/q8/q9/q21 at scale32 under config variants inside one
JVM (all knobs are runtime SQL confs). Throwaway analysis script.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lookup_transform_spark import registry
from lookup_transform_spark.session import get_spark

SF = "/root/repo/.scratch/scale32"
QUERIES = [
    "tpch_q5_local_supplier",
    "tpch_q7_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q21_waiting",
]
TABLES = (
    "region nation customer supplier part orders lineitem".split()
)

spark = get_spark("exp_rf")


from pyspark.sql import types as T

STATS_TYPES = (
    T.NumericType, T.StringType, T.DateType, T.TimestampType,
    T.BooleanType,
)


def register_stats_tables():
    # TimestampNTZ columns are EXCLUDED from column stats: Spark 4.1's
    # FilterEstimation.evaluateBinary has no NTZ case and throws
    # scala.MatchError when a filter touches an NTZ column that has
    # colStats (hit on tpch_q8's o_orderdate filter).
    t0 = time.time()
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(
            f"CREATE TABLE {t} USING parquet LOCATION '{SF}/{t}.parquet'"
        )
        schema = spark.table(t).schema
        cols = [
            f.name for f in schema.fields
            if isinstance(f.dataType, STATS_TYPES)
            and not isinstance(f.dataType, T.TimestampNTZType)
        ]
        spark.sql(
            f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(cols)
        )
    print(f"analyze all: {time.time()-t0:.2f}s", flush=True)


def run(name, use_catalog=False):
    fn = registry.QUERIES[name]
    if use_catalog:
        # monkeypatch _t to read catalog tables (stats attached)
        orig = registry._t
        registry._t = lambda s, sf, n: s.table(n)
        try:
            df = fn(spark, SF)
            n = df.count()
        finally:
            registry._t = orig
    else:
        df = fn(spark, SF)
        n = df.count()
    return n


def timeq(name, use_catalog=False, reps=2):
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        run(name, use_catalog)
        best = min(best, time.time() - t0)
    return best


def set_confs(d):
    for k, v in d.items():
        spark.conf.set(k, v)


BASE = {
    "spark.sql.cbo.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
}

VARIANTS = {
    "A_baseline": (BASE, False),
    "B_stats_cbo_rf": (
        {
            **BASE,
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        },
        True,
    ),
    "C_shj": ({**BASE, "spark.sql.join.preferSortMergeJoin": "false"}, False),
    "D_bcast64m": (
        {**BASE, "spark.sql.autoBroadcastJoinThreshold": str(64 << 20)},
        False,
    ),
    "E_stats_cbo_rf_shj_bcast": (
        {
            **BASE,
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.sql.autoBroadcastJoinThreshold": str(64 << 20),
        },
        True,
    ),
}

register_stats_tables()
only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
results = {}
for vname, (confs, cat) in VARIANTS.items():
    if only and vname not in only:
        continue
    set_confs(confs)
    for q in QUERIES:
        try:
            sec = timeq(q, use_catalog=cat)
        except Exception as exc:  # noqa: BLE001
            print(f"{vname:28s} {q:28s} FAILED: {str(exc)[:120]}", flush=True)
            continue
        results.setdefault(q, {})[vname] = round(sec, 3)
        print(f"{vname:28s} {q:28s} {sec:7.3f}s", flush=True)

print("\nsummary:")
for q, r in results.items():
    print(q, r)
