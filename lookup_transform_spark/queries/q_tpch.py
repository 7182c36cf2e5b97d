"""TPC-H breadth: EXISTS/anti-join/conditional-agg shapes, market share, profit, value concentration

Split from the monolithic registry (r11, VERDICT r10 #7). Queries here
register into ``lookup_transform_spark.registry.QUERIES``/``ORACLES``
via the shared ``_q`` decorator at import time; ``registry`` imports
every tier module at its tail, so the registry remains the single
lookup surface.
"""

from __future__ import annotations

import os  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from lookup_transform_spark.functions.fixedpoint import (  # noqa: F401
    fp_sum,
    scaled_long,
)
from lookup_transform_spark.operators import dedup as DD  # noqa: F401
from lookup_transform_spark.operators import text as TX  # noqa: F401
from lookup_transform_spark.operators.asof import (  # noqa: F401
    asof_join,
    range_join,
)
from lookup_transform_spark.operators.sessionize import sessionize  # noqa: F401
from lookup_transform_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
)
from lookup_transform_spark.plans.lookup import LookupSpec  # noqa: F401
from lookup_transform_spark.registry import (  # noqa: F401
    SCRATCH,
    _events,
    _fsum,
    _q,
    _stale_guard,
    _t,
    _vtag,
    scratch_path,
)

# ---------------------------------------------------------------------------
# TPC-H breadth II (adapted to fixture schema: no partsupp, no
# commit/receipt dates — lateness is modeled as l_shipdate far past
# o_orderdate): market share, profit rollup, value concentration,
# late-line priority split, top supplier, small-quantity revenue,
# waiting-supplier exists/not-exists
# ---------------------------------------------------------------------------

@_q(
    "tpch_q8_market_share",
    """SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS volume,
         n2.n_name AS nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) GROUP BY o_year""",
)
def q_tpch_q8_market_share(spark, sf):
    """TPC-H Q8 shape (market share): one fact scan, five broadcast
    dims, conditional-share ratio by year. All dims are broadcast so
    the only shuffle is the final tiny groupBy on year."""
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n2 = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
    )
    p = _t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(r), n1["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_nationkey"))
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    )
    vol = scaled_long("l_extendedprice * (1 - l_discount)", 4)
    zero = F.lit(0).cast("long")
    return (
        j.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@_q(
    "tpch_q9_profit",
    """SELECT nation, o_year,
       SUM(amount) / 1000000.0 AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         EXTRACT(year FROM o.o_orderdate) AS o_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 1000000) AS BIGINT)
           - CAST(ROUND(0.1 * p.p_retailprice * l.l_quantity * 1000000) AS BIGINT) AS amount
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%widget%'
) GROUP BY nation, o_year""",
)
def q_tpch_q9_profit(spark, sf):
    """TPC-H Q9 shape (product-type profit): supplycost proxied as
    10% of p_retailprice per unit (fixture has no partsupp). LIKE
    filter prunes part before the broadcast; profit rolls up by
    supplier nation x order year."""
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    # 0.1D: a bare 0.1 SQL literal parses as DECIMAL(1,1); the D suffix
    # keeps it the IEEE double the Column form (lit(0.1)) used
    amount = scaled_long("l_extendedprice * (1 - l_discount)", 6) - scaled_long(
        "0.1D * p_retailprice * l_quantity", 6
    )
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
        .agg((F.sum("amount") / F.lit(1e6)).alias("sum_profit"))
    )


@_q(
    "tpch_q11_value_conc",
    """WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS part_value
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, part_value FROM pv
WHERE part_value > (
  SELECT 1.3 * (SUM(CAST(ROUND(part_value * 100) AS BIGINT)) / 100.0) / COUNT(*)
  FROM pv)""",
)
def q_tpch_q11_value_conc(spark, sf):
    """TPC-H Q11 shape (value concentration): per-key aggregate kept
    only where it exceeds 1.3x the mean per-key value. The threshold is
    scale-free (a fixed fraction of the total empties out as the key
    count grows), and the mean re-accumulates the per-part doubles
    through fixed point so both engines compute the identical scalar.
    The threshold is an empty-frame window aggregate over the per-part
    result, so lineitem is scanned and aggregated ONCE (the
    aggregate-then-self-join formulation evaluates the CTE twice); the
    window pass runs over |parts| aggregated rows, not the fact table."""
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_extendedprice")
    per_part = li.groupBy("l_partkey").agg(_fsum("l_extendedprice", "part_value", dp=2))
    w = Window.partitionBy()
    thresh = (
        1.3
        * (F.sum(scaled_long("part_value", 2)).over(w) / 100.0)
        / F.count(F.lit(1)).over(w)
    )
    return (
        per_part.withColumn("__thresh__", thresh)
        .filter(F.col("part_value") > F.col("__thresh__"))
        .select("l_partkey", "part_value")
    )


@_q(
    "tpch_q12_late_priority",
    """SELECT l.l_linestatus,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l.l_linestatus""",
)
def q_tpch_q12_late_priority(spark, sf):
    """TPC-H Q12 shape (shipping-mode priority split): join with a
    cross-table residual (shipped >90 days after order), conditional
    counts by priority class. Counts are exact longs — no decimal
    plumbing needed."""
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_q(
    "tpch_q15_top_supplier",
    """WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)""",
)
def q_tpch_q15_top_supplier(spark, sf):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the argmax row(s) via an empty-frame window MAX over the aggregate
    — lineitem is scanned and aggregated ONCE (the max-then-self-join
    formulation evaluates the revenue CTE twice; the two branches'
    exchanges differ, so Spark's reuse rule can't collapse them). The
    window's single-partition pass runs over |suppliers| aggregated
    rows, not the fact table. Equality on double is safe cross-engine
    because both totals are the same exact-fixed-point sum cast once.
    r7 128x probe: 1.14 s @32x -> 1.21 s @128x (flat); the max-agg +
    broadcast variant costs a second lineitem scan (no exchange reuse)
    for no win — see PLANS.md."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _fsum(
                "l_extendedprice * (1 - l_discount)",
                "total_revenue", dp=4,
            )
        )
    )
    w = Window.partitionBy()
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn("__max_rev__", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("__max_rev__"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "tpch_q17_small_qty",
    """SELECT SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0
         AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT 0.5 * (CAST(SUM(CAST(ROUND(l2.l_quantity) AS BIGINT)) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""",
)
def q_tpch_q17_small_qty(spark, sf):
    """TPC-H Q17 (small-quantity revenue): correlated per-part average
    decorrelated into a groupBy + re-join. The per-part average is
    computed only over the brand-filtered keys (semantically identical:
    the correlated scalar is only evaluated for those rows)."""
    p = (
        _t(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand_li = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    # the per-part average as a window over the brand-filtered rows:
    # ONE lineitem scan (the aggregate-then-re-join formulation
    # evaluates the filtered join twice) and one shuffle of only the
    # brand survivors, keyed by part
    w = Window.partitionBy("l_partkey")
    half_avg = (
        0.5
        * F.sum(scaled_long("l_quantity", 0)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        brand_li.withColumn("__half_avg__", half_avg)
        .filter(F.col("l_quantity") < F.col("__half_avg__"))
        .agg(
            (fp_sum("l_extendedprice", 2) / 7.0).alias("avg_yearly")
        )
    )


@_q(
    "tpch_q21_waiting",
    """SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name""",
)
def q_tpch_q21_waiting(spark, sf):
    """TPC-H Q21 shape (waiting supplier): the exists/not-exists pair
    over sibling lineitems collapses into one window pass per order —
    distinct-supplier count and the set of late suppliers — instead of
    two extra self-joins of the fact table. Lateness = shipped >60 days
    after the order date (fixture has no commit/receipt dates)."""
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, li["l_orderkey"] == o["o_orderkey"]).withColumn(
        "late",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int"),
    )
    w = Window.partitionBy("l_orderkey")
    flagged = lo.select(
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("__n_supp__"),
        F.collect_set(F.when(F.col("late") == 1, F.col("l_suppkey"))).over(w).alias(
            "__late_supps__"
        ),
    ).filter(
        (F.col("late") == 1)
        & (F.col("__n_supp__") >= 2)
        & (F.size("__late_supps__") == 1)
    )
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.join(F.broadcast(s), flagged["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_q(
    "tpch_q7_volume",
    """SELECT supp_nation, cust_nation, l_year,
       SUM(CAST(ROUND(volume * 10000) AS BIGINT)) / 10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year""",
)
def q_tpch_q7_volume(spark, sf):
    """TPC-H Q7 shape (bi-national shipping volume by year): two
    broadcast nation dims aliased onto supplier and customer sides, the
    disjunctive nation-pair predicate evaluated after both attach, fact
    tables joined on their keys only. Differs from the pre-existing
    `q7_volume_shipping` (ALL cross-nation pairs, `<>` filter): this is
    the spec's selective two-nation OR-of-ANDs predicate — a different
    selectivity class and a disjunctive filter surface."""
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("__nk1__"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("__nk2__"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    volume = "l_extendedprice * (1 - l_discount)"
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__nk1__"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__nk2__"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_fsum(volume, "revenue", dp=4))
    )


@_q(
    "tpch_q10_returned",
    """SELECT c.c_custkey, c.c_name,
       SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0
         AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name""",
)
def q_tpch_q10_returned(spark, sf):
    """TPC-H Q10 shape (returned-item revenue by customer): quarter
    filter pushed into the orders scan, returnflag filter into the
    lineitem scan, customer+nation broadcast. Differs from the
    pre-existing `q10_returned` (no date window): adds the spec's
    order-date quarter predicate, so the orders scan is range-pruned
    and c_acctbal rides the output."""
    c = _t(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    revenue = "l_extendedprice * (1 - l_discount)"
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_fsum(revenue, "revenue", dp=4))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@_q(
    "tpch_q13_custdist",
    """SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count""",
)
def q_tpch_q13_custdist(spark, sf):
    """TPC-H Q13 shape (customer order-count distribution), spec-true
    form: the order-side predicate lives INSIDE the LEFT join's ON
    clause — a customer whose every order is excluded still counts with
    c_count = 0, which a WHERE-clause filter (or the unfiltered
    `q13_custdist` variant above) cannot express. The priority exclusion
    stands in for the spec's o_comment NOT LIKE (fixture has no comment
    column)."""
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "tpch_q18_large_volume",
    """SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE),
         o.o_totalprice""",
)
def q_tpch_q18_large_volume(spark, sf):
    """TPC-H Q18 shape (large-volume orders): the IN-subquery is a
    semi-join against the per-order quantity aggregate — the aggregate
    runs once, map-side combined, and only qualifying orderkeys flow
    into the main join (quantity sums are integral doubles < 2^53, so
    the >150 gate is engine-exact). Differs from the pre-existing
    `q18_volume` (plain join+HAVING, no customer attach): this is the
    spec's IN-subquery form, exercising the subquery→left-semi
    lowering plus the customer/date/totalprice projection."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q__"))
        .filter(F.col("__q__") > 150)
        .select(F.col("l_orderkey").alias("__bk__"))
    )
    c = _t(spark, sf, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    qualifying = li.join(
        big, li["l_orderkey"] == F.col("__bk__"), "left_semi"
    )
    return (
        qualifying.join(o, qualifying["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(_fsum("l_quantity", "total_qty", dp=0))
    )


@_q(
    "tpch_q2_min_cost",
    """SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size = 15
  AND s.s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    WHERE l2.l_partkey = p.p_partkey)""",
)
def q_tpch_q2_min_cost(spark, sf):
    """TPC-H Q2 shape (min-cost supplier per part): the correlated MIN
    decorrelates into a per-part window minimum over the distinct
    (part, supplier) pairs — supplycost proxied by s_acctbal since the
    fixture has no partsupp. No arithmetic, so double equality is safe."""
    p = (
        _t(spark, sf, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    pairs = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select("p_partkey", "p_name", "l_suppkey")
        .distinct()
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
    )
    w = Window.partitionBy("p_partkey")
    return (
        pairs.withColumn("__min_bal__", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__min_bal__"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


@_q(
    "tpch_q16_supplier_cnt",
    """SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size""",
)
def q_tpch_q16_supplier_cnt(spark, sf):
    """TPC-H Q16 shape (supplier count by part attributes): negated
    filters + IN-list on the dim, complaint suppliers (negative
    balance, standing in for the LIKE '%Complaints%' comment scan)
    removed by an anti join before the distinct count."""
    p = (
        _t(spark, sf, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    complaints = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(complaints), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "tpch_q20_promotion",
    """SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_suppkey
    HAVING CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS DOUBLE) > 300.0)""",
)
def q_tpch_q20_promotion(spark, sf):
    """TPC-H Q20 shape (promotion candidates): IN over a grouped
    HAVING subquery — heavy shipper of red parts in 1997 (availqty
    threshold proxied by shipped quantity; no partsupp in fixture).
    Compiles to agg -> filter -> left-semi join."""
    p = (
        _t(spark, sf, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(_fsum("l_quantity", "__qty__", dp=0))
        .filter(F.col("__qty__") > 300.0)
        .select("l_suppkey")
    )
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        s.join(F.broadcast(heavy), s["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


