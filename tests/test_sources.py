"""Source robustness (B2): malformed-record handling modes."""

from __future__ import annotations

import pytest

from lookup_transform_spark.sources import read_csv, read_json


@pytest.fixture()
def bad_csv(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,score\n1,alice,3.5\n2,bob,notanumber\n3,carol,9.9\n")
    return str(p)


def test_csv_permissive_nulls_bad_fields(spark, bad_csv):
    df = read_csv(
        spark, bad_csv, "id int, name string, score double", mode="PERMISSIVE"
    )
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] == 3.5 and rows[3] == 9.9
    assert rows[2] is None  # malformed field → null, row survives


def test_csv_dropmalformed(spark, bad_csv):
    df = read_csv(
        spark, bad_csv, "id int, name string, score double", mode="DROPMALFORMED"
    )
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_csv_failfast_raises(spark, bad_csv):
    df = read_csv(
        spark, bad_csv, "id int, name string, score double", mode="FAILFAST"
    )
    with pytest.raises(Exception, match="(?i)malformed"):
        df.collect()


def test_json_corrupt_record_column(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": 1, "v": 2.0}\n{not json at all}\n{"id": 3, "v": 4.0}\n')
    df = read_json(
        spark,
        str(p),
        "id int, v double, _corrupt_record string",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in good} == {1, 3}
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record


def test_parquet_schema_evolution_merge(spark, tmp_path):
    from lookup_transform_spark.sources.readers import read_parquet_evolving

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(path)
    # a later ingest batch added a column
    spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    df = read_parquet_evolving(spark, path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None  # pre-evolution file yields null
    assert rows[2].score == 0.5


def test_compact_to_target_size(spark, tmp_path):
    import glob

    from lookup_transform_spark.operators.compaction import compact_parquet_to_size

    src = str(tmp_path / "frag")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    orders.repartition(40).write.mode("overwrite").parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 40

    dst = str(tmp_path / "sized")
    # ~1.5 MB of data at a 1 MB target → a couple of files, not 40
    back = compact_parquet_to_size(spark, src, dst, target_mb=1)
    n = len(glob.glob(f"{dst}/part-*.parquet"))
    assert 1 <= n <= 4
    assert back.count() == orders.count()


def test_synthetic_datasource_deterministic_and_parallel(spark):
    from lookup_transform_spark.sources.synthetic import make_doc, register

    register(spark)
    df = (
        spark.read.format("synthdocs")
        .option("n", 500).option("parts", 4).option("seed", 7).load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = sorted(tuple(r) for r in df.collect())
    assert len(rows) == 500
    # rows are a pure function of (seed, doc_id): same on any re-read,
    # any partitioning, and in local python
    again = (
        spark.read.format("synthdocs")
        .option("n", 500).option("parts", 2).option("seed", 7).load()
    )
    assert rows == sorted(tuple(r) for r in again.collect())
    assert rows[0] == make_doc(7, 0)


def test_generator_oracle_sql_matches_scalar_spec():
    """The DuckDB transpilation of splitmix64 (HUGEINT split-multiply,
    UBIGINT xor) must reproduce the scalar ``make_doc`` aggregate
    bit-for-bit — this is what lets ``scan_generator_source`` carry a
    value-exact oracle for a zero-I/O source."""
    import duckdb

    from lookup_transform_spark.sources.synthetic import _mix, make_doc
    from lookup_transform_spark.sources.synthetic_oracle import (
        _sql_mix,
        generator_oracle_sql,
    )

    # the mix primitive itself, over edge-case inputs
    vals = [0, 1, (1 << 64) - 1, 42 * 1_000_003 + 1999, 0x9E3779B97F4A7C15]

    got = duckdb.sql(
        f"SELECT v, {_sql_mix('v::HUGEINT')} AS m "
        "FROM (SELECT unnest($vals) AS v)",
        params={"vals": vals},
    ).fetchall()
    assert all(int(m) == _mix(int(v)) for v, m in got)

    # the full aggregate, at two (n, seed) points
    for n, seed in ((2000, 42), (137, 7)):
        agg = {}
        for did in range(n):
            _, lang, _, _, n_chars = make_doc(seed, did)
            c = agg.setdefault(lang, [0, 0])
            c[0] += 1
            c[1] += n_chars
        exp = sorted((l, v[0], v[1]) for l, v in agg.items())
        rows = duckdb.sql(
            f"SELECT * FROM ({generator_oracle_sql(n, seed)}) ORDER BY lang"
        ).fetchall()
        assert [tuple(r) for r in rows] == exp


def test_manifest_sink_two_phase_commit(spark, tmp_path):
    import json

    from lookup_transform_spark.sources.audit_sink import read_manifest, register

    register(spark)
    path = str(tmp_path / "mout")
    nat = spark.read.parquet("/root/testdata/sf0.001/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    nat.repartition(4).write.format("manifestjson").option("path", path).mode(
        "append"
    ).save()

    man = read_manifest(path)
    assert man["total_rows"] == nat.count()
    assert len(man["shards"]) == 4
    # every shard named by the manifest exists and row counts agree
    for s in man["shards"]:
        with open(f"{path}/{s['shard']}") as f:
            assert sum(1 for _ in f) == s["rows"]
    # only manifest-listed shards are present (no partial/stray output)
    import os

    files = {f for f in os.listdir(path) if not f.startswith("_")}
    assert files == {s["shard"] for s in man["shards"]}
    # rows round-trip
    got = sorted(
        json.loads(line)["n_name"]
        for s in man["shards"]
        for line in open(f"{path}/{s['shard']}")
    )
    assert got == sorted(r["n_name"] for r in nat.collect())


def test_manifest_sink_failed_job_publishes_nothing(spark, tmp_path):
    import os

    import pytest
    from pyspark.sql import functions as F

    from lookup_transform_spark.sources.audit_sink import MANIFEST, register

    register(spark)
    path = str(tmp_path / "mfail")
    df = spark.range(100).withColumn(
        "boom", F.when(F.col("id") == 57, F.lit(1) / F.lit(0)).otherwise(F.lit(0.0))
    )
    with pytest.raises(Exception):
        # ANSI division-by-zero fails one task mid-write; the job aborts
        df.repartition(4).write.format("manifestjson").option("path", path).mode(
            "append"
        ).save()
    # no manifest ⇒ the failed write is invisible to manifest-trusting
    # readers, whatever shard fragments tasks left behind
    assert not os.path.exists(os.path.join(path, MANIFEST))


def test_binary_files_roundtrip(spark, tmp_path):
    """write_binary_files → binaryFile scan: byte-exact payloads, one
    file per row, pathGlobFilter prunes non-matching junk."""
    from pyspark.sql import functions as F

    from lookup_transform_spark.sources import (
        read_binary_files,
        write_binary_files,
    )

    payloads = {7: b"\x00\x01binary\xff", 11: b"", 23: b"plain text"}
    nonempty = {k: v for k, v in payloads.items() if v}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    out = str(tmp_path / "assets")
    write_binary_files(df, out)
    (tmp_path / "assets" / "junk.txt").write_text("not an asset")

    got = read_binary_files(spark, out, glob="*.bin").select(
        F.regexp_extract("path", r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        "content",
        "length",
    )
    rows = {r.doc_id: r for r in got.collect()}
    # junk.txt and _SUCCESS are pruned by the glob; the ZERO-LENGTH
    # asset is silently dropped by Spark's split planner — pinned here
    # as the documented caveat in read_binary_files.
    assert set(rows) == set(nonempty)
    for k, v in nonempty.items():
        assert bytes(rows[k].content) == v
        assert rows[k].length == len(v)


def test_gopher_quality_rule_attribution(spark):
    """Each Gopher rule trips on its own pathological document and the
    clean document keeps all rules green."""
    from lookup_transform_spark.operators.text import gopher_quality

    docs = spark.createDataFrame(
        [
            # clean: enough words, sane lengths, has stopwords, no digits
            (1, "the quick brown fox jumps over the lazy dog and then "
                "it runs away into the woods for a while today"),
            (2, "short text the end"),                      # r_word_count
            (3, " ".join(["supercalifragilisticexpialidocious"] * 12)),  # mean+max len
            (4, " ".join(["zz"] * 15)),                     # r_stopwords (no stopword)
            (5, "the " + " ".join(["123456"] * 14)),        # digit ratio + mean len ok
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality(docs).collect()}
    assert out[1].keep and all(
        getattr(out[1], c) for c in out[1].asDict() if c.startswith("r_")
    )
    assert not out[2].r_word_count and not out[2].keep
    assert not out[3].r_mean_word_len and not out[3].r_max_word_len
    assert not out[4].r_stopwords and not out[4].keep
    assert not out[5].r_digit_ratio and not out[5].keep


def test_manifest_sink_overwrite_sweeps_stale_shards(spark, tmp_path):
    """r8 review: shards are written under dotted temp names and
    promoted at commit; a second write to the same path must leave the
    directory holding EXACTLY the new manifest's shard set (stale
    *.jsonl from the first write violated the module's own
    no-stray-output invariant)."""
    import os

    from lookup_transform_spark.sources.audit_sink import (
        read_manifest,
        register,
    )

    register(spark)
    path = str(tmp_path / "manifest_overwrite")
    nat = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    nat.repartition(4).write.format("manifestjson").option(
        "path", path
    ).mode("overwrite").save()
    first = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    nat.repartition(2).write.format("manifestjson").option(
        "path", path
    ).mode("overwrite").save()
    man = read_manifest(path)
    on_disk = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    assert on_disk == {s["shard"] for s in man["shards"]}
    assert not (on_disk & first)  # stale shards swept
    assert not any(f.startswith(".tmp-") for f in os.listdir(path))
    assert man["total_rows"] == nat.count()


def test_manifest_sink_append_merges_previous_snapshot(spark, tmp_path):
    """r8 review: the writer ignored the overwrite flag, so
    .mode('append') silently destroyed the previous write's committed
    shards. Append must carry the old manifest's shard entries forward
    — files intact, totals summed — while overwrite still sweeps."""
    import os

    from lookup_transform_spark.sources.audit_sink import (
        read_manifest,
        register,
    )

    register(spark)
    path = str(tmp_path / "manifest_append")
    nat = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    nat.repartition(3).write.format("manifestjson").option(
        "path", path
    ).mode("append").save()
    first = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    nat.repartition(2).write.format("manifestjson").option(
        "path", path
    ).mode("append").save()
    man = read_manifest(path)
    on_disk = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    assert first <= on_disk  # previous snapshot's files retained
    assert on_disk == {s["shard"] for s in man["shards"]}
    assert len(man["shards"]) == 5
    assert man["total_rows"] == 2 * nat.count()


def test_manifest_sink_zero_task_job_publishes_empty_manifest(spark, tmp_path):
    import os

    from lookup_transform_spark.sources.audit_sink import (
        read_manifest,
        register,
    )

    register(spark)
    path = str(tmp_path / "manifest_empty")
    empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD(), "n_nationkey long, n_name string"
    )
    empty.write.format("manifestjson").option("path", path).mode(
        "append"
    ).save()
    man = read_manifest(path)
    # whether Spark schedules zero write tasks or one empty task, the
    # manifest publishes, counts zero rows, and matches the directory
    assert man["total_rows"] == 0
    on_disk = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    assert on_disk == {s["shard"] for s in man["shards"]}


def test_compact_to_size_refuses_empty_probe(spark, tmp_path):
    import pytest as _pytest

    from lookup_transform_spark.operators.compaction import (
        compact_parquet_to_size,
    )

    with _pytest.raises(ValueError, match="glob"):
        compact_parquet_to_size(
            spark, str(tmp_path / "nonexistent"), str(tmp_path / "out")
        )


def test_compact_partitioned_bounds_files_per_directory(spark, tmp_path):
    """r8 review: coalesce(N) with partition_by multiplies files (every
    task writes into every directory it holds rows for, N x |values|);
    the hash repartition bounds it to ~one file per partition dir."""
    import glob as _glob

    from lookup_transform_spark.operators.compaction import compact_parquet

    src = str(tmp_path / "src")
    spark.range(10_000).selectExpr(
        "id", "id % 10 AS dt"
    ).repartition(16).write.parquet(src)
    dst = str(tmp_path / "dst")
    out = compact_parquet(
        spark, src, dst, target_files=8, partition_by=["dt"]
    )
    assert out.count() == 10_000
    for d in _glob.glob(f"{dst}/dt=*"):
        files = _glob.glob(f"{d}/part-*.parquet")
        assert len(files) == 1, d


def test_compact_partitioned_no_target_clusters_by_partition(spark, tmp_path):
    """r8 review: partition_by WITHOUT target_files kept the source's
    fragmented task layout, multiplying files (N tasks x |values| dirs)
    from a function whose purpose is to bound them; it must cluster by
    the partition columns instead."""
    import glob as _glob

    from lookup_transform_spark.operators.compaction import compact_parquet

    src = str(tmp_path / "src_nt")
    spark.range(5_000).selectExpr("id", "id % 5 AS dt").repartition(
        16
    ).write.parquet(src)
    dst = str(tmp_path / "dst_nt")
    out = compact_parquet(spark, src, dst, partition_by=["dt"])
    assert out.count() == 5_000
    for d in _glob.glob(f"{dst}/dt=*"):
        assert len(_glob.glob(f"{d}/part-*.parquet")) == 1, d


def test_compact_to_size_partitioned_resplits_oversized_values(spark, tmp_path):
    """r8 review: the size-targeted wrapper never passed
    max_records_per_file for partitioned rewrites, so one huge partition
    value came out as one huge file regardless of target_mb; the
    bytes/row-derived records cap must re-split it."""
    import glob as _glob

    from lookup_transform_spark.operators.compaction import (
        compact_parquet_to_size,
    )

    src = str(tmp_path / "src_big")
    # one dominant partition value, ~2MB of INCOMPRESSIBLE data (md5
    # hex defeats dictionary/RLE; a constant pad compresses to nothing
    # and the bytes/row-derived cap would rightly not split it)
    spark.range(60_000).selectExpr(
        "id", "0 AS dt", "md5(cast(id AS string)) AS pad"
    ).repartition(4).write.parquet(src)
    dst = str(tmp_path / "dst_big")
    out = compact_parquet_to_size(
        spark, src, dst, target_mb=1, partition_by=["dt"]
    )
    assert out.count() == 60_000
    files = _glob.glob(f"{dst}/dt=0/part-*.parquet")
    assert len(files) > 1, "oversized partition value must be re-split"


def test_zorder_write_preserves_user_z_column(spark, tmp_path):
    from pyspark.sql import functions as F

    from lookup_transform_spark.operators.layout import zorder_write

    df = spark.range(100).select(
        "id",
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 5).alias("b"),
        F.lit("keep-me").alias("__z__"),
    )
    path = str(tmp_path / "zout")
    zorder_write(df, path, F.col("a"), F.col("b"), num_files=2, bits=4)
    back = spark.read.parquet(path)
    assert "__z__" in back.columns
    assert back.filter(F.col("__z__") == "keep-me").count() == 100
