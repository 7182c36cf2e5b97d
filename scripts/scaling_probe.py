"""Scaling probe: how do the headline operators behave as data grows
past the per-query scheduling floor?

Derives a SCALE-x copy of the sf0.1 star schema (32x: lineitem ~19.2M
rows, orders ~4.8M) by unioning key-shifted copies — perf probing only, never
used for correctness fixtures — then times representative queries on
Spark AND DuckDB at 1x and 8x. Results land in SCALING.md.

Run: python scripts/scaling_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from lookup_transform_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
SCALE = 32
OUT = f"/root/repo/.scratch/scale{SCALE}"


def build_scaled(spark) -> None:
    if os.path.exists(f"{OUT}/_done"):
        return
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    max_ok = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
    li_parts, o_parts = [], []
    for i in range(SCALE):
        shift = F.lit(i * max_ok)
        li_parts.append(li.withColumn("l_orderkey", F.col("l_orderkey") + shift))
        o_parts.append(o.withColumn("o_orderkey", F.col("o_orderkey") + shift))
    big_li, big_o = li_parts[0], o_parts[0]
    for p in li_parts[1:]:
        big_li = big_li.unionByName(p)
    for p in o_parts[1:]:
        big_o = big_o.unionByName(p)
    big_li.repartition(32).write.mode("overwrite").parquet(f"{OUT}/lineitem")
    big_o.repartition(16).write.mode("overwrite").parquet(f"{OUT}/orders")
    open(f"{OUT}/_done", "w").write("ok")


QUERIES = {
    # name: (spark_fn(spark, li_path, o_path) -> df, duckdb_sql_fmt)
    "q1_agg": (
        lambda s, li, o: s.read.parquet(li)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sq"),
            F.count(F.lit(1)).alias("n"),
        ),
        "SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) sq, COUNT(*) n FROM read_parquet('{li}/**/*.parquet') GROUP BY 1,2",
    ),
    "fact_join_agg": (
        lambda s, li, o: s.read.parquet(o)
        .join(s.read.parquet(li),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double").alias("rev")),
        "SELECT o_orderstatus, CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) rev FROM read_parquet('{o}/**/*.parquet') o JOIN read_parquet('{li}/**/*.parquet') l ON o.o_orderkey = l.l_orderkey GROUP BY 1",
    ),
    "window_topk": (
        lambda s, li, o: s.read.parquet(o)
        .withColumn("rk", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("o_orderpriority")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))))
        .filter(F.col("rk") <= 3),
        "SELECT * FROM (SELECT o_orderpriority, o_orderkey, o_totalprice, ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) rk FROM read_parquet('{o}/**/*.parquet')) WHERE rk <= 3",
    ),
    "distinct_count": (
        lambda s, li, o: s.read.parquet(li)
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("np"), F.countDistinct("l_suppkey").alias("ns")),
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) np, COUNT(DISTINCT l_suppkey) ns FROM read_parquet('{li}/**/*.parquet') GROUP BY 1",
    ),
}


def run(spark, li_path, o_path, con) -> dict:
    res = {}
    for name, (sfn, dsql) in QUERIES.items():
        t0 = time.perf_counter()
        sfn(spark, li_path, o_path).write.format("noop").mode("overwrite").save()
        spark_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(dsql.format(li=li_path, o=o_path)).fetchall()
        duck_t = time.perf_counter() - t0
        res[name] = {"spark": round(spark_t, 3), "duckdb": round(duck_t, 3)}
    return res


def main():
    spark = get_spark("scaling-probe")
    build_scaled(spark)
    con = duckdb.connect()

    # 1x: single parquet files — give both engines directory-less paths
    one_li, one_o = f"{SF_DIR}/lineitem.parquet", f"{SF_DIR}/orders.parquet"
    one = {}
    for name, (sfn, dsql) in QUERIES.items():
        t0 = time.perf_counter()
        sfn(spark, one_li, one_o).write.format("noop").mode("overwrite").save()
        st = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(
            dsql.format(li=one_li, o=one_o).replace("/**/*.parquet", "")
        ).fetchall()
        dt = time.perf_counter() - t0
        one[name] = {"spark": round(st, 3), "duckdb": round(dt, 3)}

    big = run(spark, f"{OUT}/lineitem", f"{OUT}/orders", con)
    print(json.dumps({"rows_1x": 600_000, f"rows_{SCALE}x": 600_000 * SCALE,
                      "results_1x": one, f"results_{SCALE}x": big}, indent=2))


if __name__ == "__main__":
    main()
