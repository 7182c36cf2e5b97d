"""Partition-level upsert guarantees (sources/writers.upsert_partitioned):

1. Merge semantics: updated keys take the new row, new keys insert,
   everything else survives — verified against a pure-Python dict merge.
2. Untouched partitions keep their files BYTE-FOR-BYTE (same names,
   sizes, mtimes) — the O(affected-partitions) contract.
3. The read-back of affected partitions is directory-pruned
   (PartitionFilters, not a row filter over the full table).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from lookup_transform_spark.sources.writers import (
    upsert_partitioned,
    write_parquet_partitioned,
)


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_upsert")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_parquet_partitioned(orders, path, partition_by=["o_orderstatus"])
    return path, orders


def _snapshot_files(path):
    out = {}
    for f in glob.glob(f"{path}/*/part-*.parquet"):
        st = os.stat(f)
        out[f] = (st.st_size, st.st_mtime_ns)
    return out


def test_upsert_merge_semantics(spark, table):
    path, orders = table
    # touch only status 'O': bump price on 5 existing keys, add 2 new
    some = [r["o_orderkey"] for r in
            orders.filter("o_orderstatus = 'O'").limit(5).collect()]
    new_keys = [10_000_001, 10_000_002]
    updates = spark.createDataFrame(
        [(k, "O", 1.5) for k in some] + [(k, "O", 2.5) for k in new_keys],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )

    before = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in orders.collect()
    }
    upsert_partitioned(spark, path, updates, ["o_orderkey"], "o_orderstatus")
    after = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in spark.read.parquet(path).collect()
    }

    want = dict(before)
    for r in updates.collect():
        want[r["o_orderkey"]] = (r["o_orderstatus"], r["o_totalprice"])
    assert after == want


def test_untouched_partitions_keep_files(spark, table):
    path, orders = table
    snap = _snapshot_files(path)
    updates = spark.createDataFrame(
        [(10_000_003, "O", 9.9)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    upsert_partitioned(spark, path, updates, ["o_orderkey"], "o_orderstatus")
    snap2 = _snapshot_files(path)
    untouched_before = {f: v for f, v in snap.items() if "o_orderstatus=O" not in f}
    untouched_after = {f: v for f, v in snap2.items() if "o_orderstatus=O" not in f}
    assert untouched_before == untouched_after  # names, sizes, mtimes
    # and the touched partition was rewritten
    touched_after = {f for f in snap2 if "o_orderstatus=O" in f}
    touched_before = {f for f in snap if "o_orderstatus=O" in f}
    assert touched_after != touched_before or snap2 != snap


def test_affected_read_is_partition_pruned(spark, table):
    path, _ = table
    back = spark.read.parquet(path).filter(
        F.col("o_orderstatus").isin(["O"])
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    pf = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
    assert pf and "o_orderstatus" in pf[0]


def test_key_move_detected_when_validation_on(spark, table):
    path, orders = table
    victim = orders.filter("o_orderstatus = 'O'").limit(1).collect()[0]
    moved = spark.createDataFrame(
        [(victim["o_orderkey"], "F", 1.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    with pytest.raises(ValueError, match="moves key"):
        upsert_partitioned(
            spark, path, moved, ["o_orderkey"], "o_orderstatus",
            validate_no_key_moves=True,
        )
    # and nothing was written: the table still holds the original row
    back = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in spark.read.parquet(path).collect()
    }
    assert back[victim["o_orderkey"]] == "O"
