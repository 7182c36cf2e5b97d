"""The reference's canonical golden test, reproduced (FIXTURES.md §1).

Source fixture: LookupTest.java:56-73 (schemas), :128-155 (rows),
:157-176 (expected output incl. the null-on-miss row). Unlike the
reference's order-dependent compare (LookupTest.java:174-176) we sort
by key.
"""

from __future__ import annotations

from dataclasses import replace

import pytest
from pyspark.sql import types as T

from lookup_transform_spark import LookupConfigError, LookupSpec

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType(), False),
        T.StructField("first_name", T.StringType(), False),
        T.StructField("last_name", T.StringType(), False),
    ]
)
PHONE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("customer_id", T.IntegerType(), False),
        T.StructField("phone_number", T.StringType(), False),
    ]
)

SPEC = LookupSpec(
    lookup_dataset="phone_numbers",
    input_key_field="customer_id",
    lookup_key_field="customer_id",
    lookup_value_field="phone_number",
    output_field="phone",
)


@pytest.fixture(scope="module")
def customers(spark):
    return spark.createDataFrame(
        [(1, "John", "Doe"), (2, "Jane", "Doe")], CUSTOMER_SCHEMA
    )


@pytest.fixture(scope="module")
def phones(spark):
    return spark.createDataFrame([(1, 1, "555-555-555")], PHONE_SCHEMA)


def test_golden_lookup(customers, phones):
    out = SPEC.apply(customers, phones)
    rows = sorted(out.collect(), key=lambda r: r.customer_id)
    assert out.columns == ["customer_id", "first_name", "last_name", "phone"]
    assert len(rows) == 2  # LookupTest.java:173
    assert rows[0].asDict() == {
        "customer_id": 1, "first_name": "John", "last_name": "Doe",
        "phone": "555-555-555",
    }
    # miss row survives with null phone (LookupTest.java:171-172)
    assert rows[1].asDict() == {
        "customer_id": 2, "first_name": "Jane", "last_name": "Doe", "phone": None,
    }


def test_output_column_forced_nullable(customers, phones):
    # Lookup.java:455-457: output col nullable even though source is not
    out = SPEC.apply(customers, phones)
    assert out.schema["phone"].nullable is True
    assert SPEC.output_schema(CUSTOMER_SCHEMA, PHONE_SCHEMA)["phone"].nullable is True


def test_duplicate_lookup_keys_multiply(spark, customers):
    # SURVEY §2.1 fine print 3: true join semantics, no dedup
    phones2 = spark.createDataFrame(
        [(1, 1, "555-555-555"), (2, 1, "555-123-456")], PHONE_SCHEMA
    )
    out = SPEC.apply(customers, phones2)
    assert out.count() == 3


def test_null_keys_never_match(spark, phones):
    # SURVEY §2.1 fine print 2: null-unsafe equality (Lookup.java:224)
    schema = T.StructType(
        [
            T.StructField("customer_id", T.IntegerType(), True),
            T.StructField("first_name", T.StringType(), False),
            T.StructField("last_name", T.StringType(), False),
        ]
    )
    customers = spark.createDataFrame([(None, "Nul", "Key")], schema)
    phones_null = spark.createDataFrame([(9, None, "999")], T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("customer_id", T.IntegerType(), True),
            T.StructField("phone_number", T.StringType(), False),
        ]
    ))
    out = SPEC.apply(customers, phones_null).collect()
    assert len(out) == 1 and out[0].phone is None


def test_output_field_defaults_to_value_name(customers, phones):
    # Lookup.java:389-391
    spec = LookupSpec(
        lookup_dataset="phone_numbers",
        input_key_field="customer_id",
        lookup_key_field="customer_id",
        lookup_value_field="phone_number",
    )
    out = spec.apply(customers, phones)
    assert out.columns[-1] == "phone_number"


def test_collision_rejected(customers, phones):
    # Lookup.java:515-518
    spec = replace(SPEC, output_field="first_name")
    with pytest.raises(LookupConfigError, match="already exists"):
        spec.apply(customers, phones)


def test_duplicate_output_names_rejected(customers, phones):
    """r8 review: duplicate output_field entries passed validation and
    died later in the projection with an opaque AMBIGUOUS_REFERENCE —
    every config mistake must surface through the taxonomy."""
    spec = replace(
        SPEC,
        lookup_value_field=["phone_number", "customer_id"],
        output_field=["x", "x"],
    )
    with pytest.raises(LookupConfigError, match="more than once"):
        spec.apply(customers, phones)


def test_ntz_key_join_is_type_compatible(spark):
    """r8 review: TIMESTAMP_NTZ was missing from the compatibility
    groups, so a plain NTZ = NTZ key join was rejected as incompatible
    even though Spark joins it fine."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "id long, k string"
    ).withColumn("k", F.col("k").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [("2024-01-01 00:00:00", "hit")], "k string, v string"
    ).withColumn("k", F.col("k").cast("timestamp_ntz"))
    spec = LookupSpec(
        lookup_dataset="lkp",
        input_key_field="k",
        lookup_key_field="k",
        lookup_value_field="v",
    )
    out = spec.apply(left, right)
    assert [r["v"] for r in out.collect()] == ["hit"]


def test_validation_taxonomy():
    inputs = {"customer": CUSTOMER_SCHEMA, "phone_numbers": PHONE_SCHEMA}
    # missing required field (Lookup.java:411-428)
    with pytest.raises(LookupConfigError, match="Missing required"):
        LookupSpec("phone_numbers", "", "customer_id", "phone_number").validate(inputs)
    # != 2 inputs (Lookup.java:471-480)
    with pytest.raises(LookupConfigError, match="exactly 2 inputs"):
        SPEC.validate({"customer": CUSTOMER_SCHEMA})
    # lookup not among inputs (Lookup.java:485-489)
    with pytest.raises(LookupConfigError, match="not an input"):
        LookupSpec("nope", "customer_id", "customer_id", "phone_number").validate(inputs)
    # absent fields (Lookup.java:490-509)
    with pytest.raises(LookupConfigError, match="Lookup key field"):
        LookupSpec("phone_numbers", "customer_id", "zzz", "phone_number").validate(inputs)
    with pytest.raises(LookupConfigError, match="Lookup value field"):
        LookupSpec("phone_numbers", "customer_id", "customer_id", "zzz").validate(inputs)
    with pytest.raises(LookupConfigError, match="Input key field"):
        LookupSpec("phone_numbers", "zzz", "customer_id", "phone_number").validate(inputs)
    # type incompatibility (Lookup.java:510-514)
    with pytest.raises(LookupConfigError, match="not compatible"):
        LookupSpec("phone_numbers", "first_name", "customer_id", "phone_number").validate(inputs)
    # happy path returns the derived schema
    schema = SPEC.validate(inputs)
    assert schema.fieldNames() == ["customer_id", "first_name", "last_name", "phone"]


def test_error_targeting_granularity():
    """InvalidJoinException remap targets (Lookup.java:237-254): each
    JoinError type attaches a distinct affordance — JOIN_KEY errors a
    config property, SELECTED_FIELD errors a (property, element) pair in
    'stage.field as alias' form, OUTPUT_SCHEMA errors the schema field."""
    inputs = {"customer": CUSTOMER_SCHEMA, "phone_numbers": PHONE_SCHEMA}
    # JOIN_KEY / JOIN_KEY_FIELD → config property (Lookup.java:240-243)
    with pytest.raises(LookupConfigError) as ei:
        LookupSpec(
            "phone_numbers", "zzz", "customer_id", "phone_number"
        ).validate(inputs)
    (f,) = ei.value.failures
    assert f.config_property == "input_key_field"
    assert f.config_element is None and f.output_schema_field is None
    # SELECTED_FIELD → one element of the multi-valued property, in the
    # reference's "stage.field as alias" form (Lookup.java:244-248)
    with pytest.raises(LookupConfigError) as ei:
        LookupSpec(
            "phone_numbers", "customer_id", "customer_id", "zzz", "phone"
        ).validate(inputs)
    (f,) = ei.value.failures
    assert f.config_element == ("lookup_value_field", "phone_numbers.zzz as phone")
    assert f.config_property is None
    # OUTPUT_SCHEMA → the offending output-schema field (Lookup.java:249-252)
    with pytest.raises(LookupConfigError) as ei:
        replace(SPEC, output_field="first_name").validate(inputs)
    (f,) = ei.value.failures
    assert f.output_schema_field == "first_name"
    assert "first_name" in str(f)


def test_macros_defer_validation():
    inputs = {"customer": CUSTOMER_SCHEMA, "phone_numbers": PHONE_SCHEMA}
    spec = LookupSpec(
        "phone_numbers", "${key}", "customer_id", "phone_number", "phone"
    )
    assert spec.macro_fields() == {"input_key_field"}
    assert spec.validate(inputs) is None  # deferred (Lookup.java:193-195)
    resolved = spec.resolve({"key": "customer_id"})
    assert resolved.macro_fields() == set()
    assert resolved.validate(inputs) is not None


def test_default_value_applies_on_miss_only(spark):
    """B12 semantics: default_value means 'no match found' — a MATCHED
    row whose lookup value is genuinely NULL keeps its NULL (a bare
    coalesce over the value column would rewrite it)."""
    inp = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    lkp = spark.createDataFrame(
        [(1, "a"), (2, None)], "k int, v string"
    )
    spec = LookupSpec("lkp", "k", "k", "v", default_value="MISS")
    got = {r["k"]: r["v"] for r in spec.apply(inp, lkp).collect()}
    assert got == {1: "a", 2: None, 3: "MISS"}


def test_first_match_order_accepts_lookup_column_names(spark):
    """first_match_order resolves original lookup column names even
    when output_field renames the value, and accepts tiebreaker
    columns outside the value list."""
    inp = spark.createDataFrame([(1,)], "k int")
    lkp = spark.createDataFrame(
        [(1, "late", 9), (1, "early", 2)], "k int, v string, prio int"
    )
    # order by the ORIGINAL value-field name while renaming v -> val
    spec = LookupSpec(
        "lkp", "k", "k", "v", "val",
        first_match=True, first_match_order=["v"],
    )
    assert spec.apply(inp, lkp).collect()[0]["val"] == "early"
    # order by a lookup column that is NOT a value field
    spec2 = LookupSpec(
        "lkp", "k", "k", "v", "val",
        first_match=True, first_match_order=["prio"],
    )
    assert spec2.apply(inp, lkp).collect()[0]["val"] == "early"
    # unknown order column is a config error, not UNRESOLVED_COLUMN
    spec3 = LookupSpec(
        "lkp", "k", "k", "v", "val",
        first_match=True, first_match_order=["zzz"],
    )
    with pytest.raises(LookupConfigError, match="first_match_order"):
        spec3.apply(inp, lkp)


def test_first_match_order_rejects_alias_shadowing_lookup_column(spark):
    """An output alias that ALSO names a distinct real lookup column is
    ambiguous — ordering silently by the renamed value (ignoring the
    user's dedicated priority column) must be a config error, not a
    precedence surprise."""
    inp = spark.createDataFrame([(1,)], "k int")
    # value field v is renamed to 'prio', but the lookup has its own
    # real 'prio' column with the opposite ordering
    lkp = spark.createDataFrame(
        [(1, "late", 9), (1, "early", 2)], "k int, v string, prio int"
    )
    spec = LookupSpec(
        "lkp", "k", "k", "v", "prio",
        first_match=True, first_match_order=["prio"],
    )
    with pytest.raises(LookupConfigError, match="ambiguous"):
        spec.apply(inp, lkp)
    # unambiguous spelling: order by the original value-field name
    spec_ok = LookupSpec(
        "lkp", "k", "k", "v", "prio",
        first_match=True, first_match_order=["v"],
    )
    assert spec_ok.apply(inp, lkp).collect()[0]["prio"] == "early"
    # default alias (output name == value field name) stays legal even
    # though the name is trivially also a lookup column
    spec_default = LookupSpec(
        "lkp", "k", "k", "v",
        first_match=True, first_match_order=["v"],
    )
    assert spec_default.apply(inp, lkp).collect()[0]["v"] == "early"
    # NO explicit order + shadowing alias: not ambiguous — the user
    # never named a column, so the documented default (order by the
    # output values under their aliases) applies without error
    spec_implicit = LookupSpec(
        "lkp", "k", "k", "v", "prio", first_match=True,
    )
    assert spec_implicit.apply(inp, lkp).collect()[0]["prio"] == "early"


def test_macro_output_field_defers_count_check_not_value_validation():
    """Regression: with a multi-valued lookup_value_field and a macro'd
    output_field, validation must defer the alias count check (the raw
    '${...}' string is not one alias) while STILL validating the value
    fields themselves against the lookup schema."""
    inputs = {"customer": CUSTOMER_SCHEMA, "phone_numbers": PHONE_SCHEMA}
    spec = LookupSpec(
        "phone_numbers", "customer_id", "customer_id",
        ["phone_number", "customer_id"], "${outs}",
    )
    assert spec.validate(inputs) is None  # deferred, no count error
    bad = LookupSpec(
        "phone_numbers", "customer_id", "customer_id",
        ["phone_number", "zzz"], "${outs}",
    )
    with pytest.raises(LookupConfigError, match="value field 'zzz'"):
        bad.validate(inputs)


def test_schema_json_override(customers, phones):
    schema = SPEC.output_schema(CUSTOMER_SCHEMA, PHONE_SCHEMA)
    spec = replace(SPEC, schema_json=schema.json())
    out = spec.apply(customers, phones)
    assert out.count() == 2
    # mismatched schema is a config error (Lookup.java:226-230, 393-404)
    bad = T.StructType([T.StructField("x", T.IntegerType())])
    spec_bad = replace(SPEC, schema_json=bad.json())
    with pytest.raises(LookupConfigError, match="mismatch"):
        spec_bad.apply(customers, phones)
    with pytest.raises(LookupConfigError, match="Unable to parse"):
        LookupSpec.parse_schema_json("{not json")


def test_lineage(customers, phones):
    ops = SPEC.lineage(CUSTOMER_SCHEMA, "customer")
    assert ops["customer_id"]["operation"] == "Join"
    assert "phone_numbers.customer_id" in ops["customer_id"]["inputs"]
    assert ops["first_name"] == {
        "operation": "Identity",
        "description": "Copied from input",
        "inputs": ["customer.first_name"],
    }
    assert ops["phone"]["operation"] == "Rename"
    assert ops["phone"]["inputs"] == ["phone_numbers.phone_number"]


def test_broadcast_hint_in_plan(customers, phones):
    plan = SPEC.apply(customers, phones)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
