"""Fixed-point aggregation guarantees (functions/fixedpoint.py):

1. fp_sum equals the exact decimal(38,6) formulation it replaced —
   bit-for-bit on the double output (same rounding contract, faster
   accumulator).
2. fp_sum is order/partitioning-independent (the reason it exists).
3. fp_sum_stable — the beyond-2^63 two-stage form — is bit-identical
   to fp_sum wherever both are in range.
4. A >2^63 scaled total fails loudly under the session's ANSI mode
   (never a silent wrap); fp_sum_stable survives the same input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lookup_transform_spark.functions.fixedpoint import (
    fp_sum,
    fp_sum_stable,
    scaled_long,
)


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_fp_sum_matches_decimal_formulation(li):
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    fp = li.groupBy("l_returnflag").agg(
        fp_sum("l_quantity", 0).alias("q"),
        fp_sum("l_extendedprice", 2).alias("p"),
        fp_sum(disc, 4).alias("d"),
        fp_sum(charge, 6).alias("c"),
    )
    dec = li.groupBy("l_returnflag").agg(
        F.sum(F.round(F.col("l_quantity")).cast("decimal(38,0)"))
        .cast("double").alias("q"),
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)"))
         / F.lit(100).cast("decimal(38,6)")).cast("double").alias("p"),
        (F.sum(F.round(disc * 10000).cast("decimal(38,0)"))
         / F.lit(10000).cast("decimal(38,6)")).cast("double").alias("d"),
        (F.sum(F.round(charge * 1000000).cast("decimal(38,0)"))
         / F.lit(1000000).cast("decimal(38,6)")).cast("double").alias("c"),
    )
    a = {r["l_returnflag"]: r for r in fp.collect()}
    b = {r["l_returnflag"]: r for r in dec.collect()}
    assert set(a) == set(b)
    for k in a:
        for col in ("q", "p", "d", "c"):
            assert a[k][col] == b[k][col], (k, col)


def test_fp_sum_partitioning_independent(li):
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    one = li.coalesce(1).agg(fp_sum(disc, 4).alias("s")).collect()[0]["s"]
    many = li.repartition(16).agg(fp_sum(disc, 4).alias("s")).collect()[0]["s"]
    assert one == many  # bit-exact, not approx


def test_fp_sum_stable_equals_fp_sum(li):
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    fast = li.groupBy("l_returnflag", "l_linestatus").agg(
        fp_sum("l_quantity", 0).alias("q"),
        fp_sum(charge, 6).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    stable = fp_sum_stable(
        li,
        ["l_returnflag", "l_linestatus"],
        {"q": ("l_quantity", 0), "c": (charge, 6)},
        count_alias="n",
    )
    a = {(r[0], r[1]): r for r in fast.collect()}
    b = {(r[0], r[1]): r for r in stable.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["q"] == b[k]["q"], k
        assert a[k]["c"] == b[k]["c"], k
        assert a[k]["n"] == b[k]["n"], k


def test_overflow_fails_loudly_and_stable_survives(spark):
    # two rows whose scaled sum exceeds 2^63: ANSI long sum must raise,
    # the two-stage decimal merge must return the exact total — but only
    # when the rows land in different partitions (the long PARTIAL would
    # overflow otherwise; that per-partition bound is the documented
    # contract).
    big = 6.0e18  # scaled at dp=0: 2 rows -> 1.2e19 > 2^63
    df = (
        spark.range(2)
        .repartition(2)  # round-robin: exactly one row per partition
        .select(F.lit("g").alias("g"), F.lit(big).alias("v"))
    )
    with pytest.raises(Exception) as exc:
        df.agg(fp_sum("v", 0).alias("s")).collect()
    assert "overflow" in str(exc.value).lower() or "ARITHMETIC" in str(exc.value)

    out = fp_sum_stable(df, ["g"], {"s": ("v", 0)}).collect()
    assert len(out) == 1 and out[0]["s"] == 1.2e19


def test_scaled_long_rounding_matches_duckdb():
    import duckdb

    vals = [0.005, 1.115, -2.675, 1234.56, -0.015, 99.994999, 3.0000005]
    con = duckdb.connect()
    duck = [
        con.execute(
            "SELECT CAST(ROUND(CAST(? AS DOUBLE) * 100) AS BIGINT)", [v]
        ).fetchone()[0]
        for v in vals
    ]
    import pyspark.sql.functions as F  # noqa: F811
    from lookup_transform_spark.session import get_spark

    spark = get_spark("fixedpoint-round")
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r[0] for r in df.select(scaled_long("v", 2)).collect()]
    assert got == duck


def test_fp_sum_matches_exact_rational_sum_property(spark):
    """Property (hypothesis): for any batch of 2dp-quantized doubles,
    fp_sum equals the exact Fraction-arithmetic sum — i.e. fixed-point
    long accumulation is EXACT, not approximately right. Few examples,
    many values each: the property is per-expression, not per-plan."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-10_000_000, max_value=10_000_000),
            min_size=1,
            max_size=300,
        )
    )
    def check(cents):
        vals = [c / 100.0 for c in cents]  # 2dp fixed-point as doubles
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.agg(fp_sum("v", 2).alias("s")).collect()[0]["s"]
        # the scaled totals here stay well under 2^53, so the exact sum
        # is representable and equality must be BIT-exact
        exact = Fraction(sum(cents), 100)
        assert got == float(exact), (got, float(exact))

    check()


def test_scaled_long_matches_bigdecimal_round_exactly(spark):
    """r11: scaled_long's float-only HALF_UP (floor/ceil + exact-frac
    compare) must agree with Spark's BigDecimal-backed round() on every
    double — including exact halves, ±ulp-of-half neighbors, signed
    zeros, 1e15-scale values, and the 2^52 exactness boundary. The
    fractional part of a double is exactly representable, so the 0.5
    comparison is the same exact decision BigDecimal makes."""
    from pyspark.sql import functions as F

    from lookup_transform_spark.functions.fixedpoint import scaled_long

    vals = [
        0.5, 1.5, 2.5, -0.5, -1.5, -2.5,
        0.49999999999999994, -0.49999999999999994,
        2.4999999999999996, 2.5000000000000004, -2.4999999999999996,
        1e15 + 0.5, -1e15 - 0.5, 123.456, -123.456, 0.0, -0.0,
        1e-300, -1e-300,
        4503599627370495.5, -4503599627370495.5,  # 2^52 boundary
        0.005, -0.005, 1.005, 2.675,  # classic repr-error cases
    ]
    for dp in (0, 2, 6):
        # scaled values past 2^63 raise CAST_OVERFLOW in BOTH forms
        # (the ANSI fail-loud contract, covered elsewhere) — keep each
        # dp's sample inside the representable range
        keep = [v for v in vals if abs(v) * 10 ** dp < 9e18]
        df = spark.createDataFrame([(v,) for v in keep], "v double")
        scale = F.lit(float(10 ** dp))
        ref = F.round(F.col("v") * scale).cast("long") if dp else (
            F.round(F.col("v")).cast("long")
        )
        got = df.select(
            "v", ref.alias("r"), scaled_long(F.col("v"), dp).alias("t")
        ).collect()
        bad = [(r["v"], r["r"], r["t"]) for r in got if r["r"] != r["t"]]
        assert not bad, f"dp={dp}: {bad}"
