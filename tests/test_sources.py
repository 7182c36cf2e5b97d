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
