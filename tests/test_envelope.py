"""Envelope parse tests — the declared-schema fix for the reference's
per-batch inference (SURVEY.md §7.4.1) and the delete before-image fix
(§7.4.4: the reference's own projection README.md:183-184 would emit null
ids on deletes)."""

from __future__ import annotations

import json

from debezium_emr_hudi_deltastreamer_sample_spark.envelope import (
    parse_envelope,
    topic_to_table,
)


def env(op, after=None, before=None, lsn=0, ts_ms=0):
    return json.dumps(
        {
            "schema": {},
            "payload": {
                "before": before,
                "after": after,
                "source": {"lsn": lsn, "ts_ms": ts_ms, "table": "employees"},
                "op": op,
                "ts_ms": ts_ms,
            },
        }
    )


ROW = {
    "id": 1,
    "full_name": "Ada Lovelace",
    "email": "ada@example.com",
    "phone": "555-0100",
    "department": "IT",
    "salary": 120000,
    "created_at": "2020-01-02",
}


def kafka_shaped(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value string")


def test_insert_parses_after_image(spark):
    out = parse_envelope(kafka_shaped(spark, [env("c", after=ROW, lsn=10)]))
    [r] = out.collect()
    assert r.op == "c" and r._lsn == 10
    assert r.id == 1 and r.full_name == "Ada Lovelace" and r.salary == 120000
    assert str(r.created_at) == "2020-01-02"


def test_delete_keeps_before_image_keys(spark):
    # op='d' arrives with after=null (tombstones disabled, README.md:260).
    out = parse_envelope(kafka_shaped(spark, [env("d", before=ROW, lsn=11)]))
    [r] = out.collect()
    assert r.op == "d" and r.id == 1  # reference projection would yield null


def test_empty_batch_is_noop(spark):
    # The reference's inference path crashes here; declared schema must not.
    assert parse_envelope(kafka_shaped(spark, [])).count() == 0


def test_all_delete_batch_keeps_schema(spark):
    out = parse_envelope(kafka_shaped(spark, [env("d", before=ROW)]))
    assert "id" in out.columns and dict(out.dtypes)["id"] == "int"


def test_malformed_json_dropped(spark):
    out = parse_envelope(kafka_shaped(spark, ["not json", env("c", after=ROW)]))
    assert out.count() == 1


def test_topic_to_table(spark):
    df = spark.createDataFrame(
        [("debezium1.public.employees",)], "topic string"
    ).select(topic_to_table().alias("t"))
    assert df.first().t == "employees"


def test_schema_inference_bootstrap_matches_declared(spark):
    """A5 (reference's per-batch spark.read.json inference, README.md:179)
    kept as a BOOTSTRAP tool: inferring from sample envelopes yields the
    declared schema's field tree, validating that the declared StructType
    is the right registration-time replacement for per-batch inference."""
    sample = spark.createDataFrame(
        [BATCH for BATCH in [
            '{"payload": {"before": null, "after": {"id": 1, "full_name": "a",'
            ' "email": "e", "phone": "p", "department": "d", "salary": 5,'
            ' "created_at": "2024-01-01"}, "source": {"lsn": 1, "ts_ms": 1,'
            ' "table": "employees"}, "op": "c", "ts_ms": 1}}',
        ]],
        "string",
    ).toDF("value")
    inferred = spark.read.json(sample.rdd.map(lambda r: r.value)).schema
    assert [f.name for f in inferred.fields] == ["payload"]
    payload = dict(zip([f.name for f in inferred["payload"].dataType.fields],
                       inferred["payload"].dataType.fields))
    assert set(payload) == {"before", "after", "source", "op", "ts_ms"}
    after_fields = {f.name for f in payload["after"].dataType.fields}
    assert after_fields == {
        "id", "full_name", "email", "phone", "department", "salary", "created_at"
    }


def test_avro_envelope_schema_matches_declared_structtype():
    """B4 schema-level check (no spark-avro jar in this container, so the
    serde itself is gated): the generated Debezium-shaped Avro schema must
    mirror the declared envelope StructType field-for-field — top-level
    record (NO payload wrapper, that nesting is a JsonConverter artifact),
    nullable-union fields with null defaults, before/after sharing one
    named row record, date/timestamp as Avro logical types."""
    import json

    from debezium_emr_hudi_deltastreamer_sample_spark.envelope import (
        EMPLOYEES_SCHEMA,
        envelope_avro_schema,
    )

    schema = json.loads(envelope_avro_schema())
    assert schema["type"] == "record" and schema["name"] == "Envelope"
    fields = {f["name"]: f for f in schema["fields"]}
    assert list(fields) == ["before", "after", "source", "op", "ts_ms"]
    # Every envelope field is optional: ["null", T] union with null default.
    for f in schema["fields"]:
        assert f["type"][0] == "null" and f["default"] is None

    # before = full named row record matching the declared source schema.
    before = fields["before"]["type"][1]
    assert before["type"] == "record" and before["name"] == "Value"
    by_name = {f["name"]: f["type"][1] for f in before["fields"]}
    assert list(by_name) == [f.name for f in EMPLOYEES_SCHEMA.fields]
    assert by_name["id"] == "int" and by_name["salary"] == "int"
    assert by_name["full_name"] == "string"
    assert by_name["created_at"] == {"type": "int", "logicalType": "date"}
    # after references the SAME named type (Avro forbids redefinition).
    assert fields["after"]["type"][1] == "debezium1.public.Value"

    source = fields["source"]["type"][1]
    src_types = {f["name"]: f["type"][1] for f in source["fields"]}
    assert src_types == {"lsn": "long", "ts_ms": "long", "table": "string"}
    assert fields["op"]["type"][1] == "string"
    assert fields["ts_ms"]["type"][1] == "long"


def test_avro_binary_roundtrip_pure_python():
    """The engine's own Avro binary codec must round-trip the envelope —
    records, null unions, logical dates — byte-exactly through encode →
    decode."""
    import datetime

    from debezium_emr_hudi_deltastreamer_sample_spark.avro_codec import EnvelopeAvro
    from debezium_emr_hudi_deltastreamer_sample_spark.envelope import (
        envelope_avro_schema,
    )

    codec = EnvelopeAvro(envelope_avro_schema())
    row = dict(ROW, created_at=datetime.date(2020, 1, 2))
    envd = {
        "before": None,
        "after": row,
        "source": {"lsn": 42, "ts_ms": 42, "table": "employees"},
        "op": "c",
        "ts_ms": 42,
    }
    back = codec.decode(codec.encode(envd))
    assert back["op"] == "c" and back["source"]["lsn"] == 42
    assert back["after"] == row and back["before"] is None
    # Zigzag negatives + delete shape.
    envd2 = {
        "before": dict(row, salary=-5),
        "after": None,
        "source": {"lsn": -9, "ts_ms": 1, "table": "employees"},
        "op": "d",
        "ts_ms": 1,
    }
    back2 = codec.decode(codec.encode(envd2))
    assert back2["before"]["salary"] == -5 and back2["source"]["lsn"] == -9


def test_avro_and_json_envelope_paths_agree(spark):
    """Serde equivalence (reference B4): the SAME event sequence pushed
    through the JSON path (payload wrapper → from_json) and through real
    Avro binary bytes (pure-Python writer → parse_envelope_avro_py) must
    produce identical flat change rows — including delete before-images
    and the date logical type."""
    import datetime

    from debezium_emr_hudi_deltastreamer_sample_spark.avro_codec import EnvelopeAvro
    from debezium_emr_hudi_deltastreamer_sample_spark.envelope import (
        envelope_avro_schema,
        parse_envelope_avro_py,
    )

    row2 = dict(ROW, id=2, full_name="Grace Hopper", salary=140000)
    events = [
        ("c", None, ROW, 10),
        ("c", None, row2, 11),
        ("u", None, dict(row2, salary=150000), 12),
        ("d", ROW, None, 13),
    ]

    json_df = parse_envelope(
        kafka_shaped(
            spark,
            [
                env(op, after=a, before=b, lsn=lsn, ts_ms=lsn)
                for op, b, a, lsn in events
            ],
        )
    )

    codec = EnvelopeAvro(envelope_avro_schema())

    def avroize(img):
        if img is None:
            return None
        return dict(img, created_at=datetime.date.fromisoformat(img["created_at"]))

    blobs = [
        codec.encode(
            {
                "before": avroize(b),
                "after": avroize(a),
                "source": {"lsn": lsn, "ts_ms": lsn, "table": "employees"},
                "op": op,
                "ts_ms": lsn,
            }
        )
        for op, b, a, lsn in events
    ]
    avro_df = parse_envelope_avro_py(
        spark.createDataFrame([(b,) for b in blobs], "value binary")
    )

    assert avro_df.columns == json_df.columns
    assert avro_df.schema == json_df.schema
    key = lambda r: r["_lsn"]  # noqa: E731
    jrows = sorted((r.asDict() for r in json_df.collect()), key=key)
    arows = sorted((r.asDict() for r in avro_df.collect()), key=key)
    assert jrows == arows


def test_avro_codec_nan_is_null_and_null_op_dropped(spark):
    """Two serde-lane-parity regressions: (1) pandas representes NULL
    numeric fields as float64 NaN — the codec must take the null union
    branch, not crash in the varint writer or leak NaN into doubles;
    (2) a decodable envelope with op=null must be DROPPED by
    parse_envelope_avro_py, exactly as the JSON and jar lanes filter
    op IS NOT NULL."""
    from debezium_emr_hudi_deltastreamer_sample_spark.avro_codec import EnvelopeAvro
    from debezium_emr_hudi_deltastreamer_sample_spark.envelope import (
        envelope_avro_schema,
        parse_envelope_avro_py,
    )
    from pyspark.sql import types as T

    row_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    schema_json = envelope_avro_schema(row_schema)
    # nan_is_null is OPT-IN (the pandas lane turns it on; the plain-Row
    # avrolog lane keeps NaN a real double — see next test).
    codec = EnvelopeAvro(schema_json, nan_is_null=True)
    nan = float("nan")
    good = codec.encode(
        {
            "before": None,
            "after": {"id": nan, "v": nan},   # pandas-NULL shape
            "source": {"lsn": nan, "ts_ms": 1, "table": "t"},
            "op": "c",
            "ts_ms": 1,
        }
    )
    back = codec.decode(good)
    assert back["after"] == {"id": None, "v": None}
    assert back["source"]["lsn"] is None

    no_op = codec.encode(
        {
            "before": None,
            "after": {"id": 7, "v": 1.5},
            "source": {"lsn": 1, "ts_ms": 1, "table": "t"},
            "op": None,
            "ts_ms": 1,
        }
    )
    raw = spark.createDataFrame(
        [(bytearray(good),), (bytearray(no_op),)], "value binary"
    )
    out = parse_envelope_avro_py(raw, schema_json, row_schema).collect()
    assert len(out) == 1 and out[0].op == "c"


def test_avro_codec_preserves_real_nan_by_default(spark):
    """Regression (round-4 review finding): NaN is a legitimate non-null
    double in Spark. The default codec (Row lane / avrolog writer) must
    encode it as a NaN double, not silently take the null union branch."""
    import math

    from debezium_emr_hudi_deltastreamer_sample_spark.avro_codec import EnvelopeAvro
    from debezium_emr_hudi_deltastreamer_sample_spark.envelope import (
        envelope_avro_schema,
    )
    from pyspark.sql import types as T

    row_schema = T.StructType([T.StructField("v", T.DoubleType())])
    codec = EnvelopeAvro(envelope_avro_schema(row_schema))
    blob = codec.encode(
        {
            "before": None,
            "after": {"v": float("nan")},
            "source": {"lsn": 1, "ts_ms": 1, "table": "t"},
            "op": "c",
            "ts_ms": 1,
        }
    )
    back = codec.decode(blob)
    assert back["after"]["v"] is not None and math.isnan(back["after"]["v"])


def test_avro_codec_timestamp_micros_utc_integer_roundtrip():
    """timestamp-micros: naive datetimes encode as UTC (engine session
    convention) with integer math — no float microsecond loss — and
    decode to the same tz-aware UTC instant."""
    import datetime

    from debezium_emr_hudi_deltastreamer_sample_spark.avro_codec import EnvelopeAvro

    schema = (
        '{"type":"record","name":"R","fields":[{"name":"ts","type":'
        '{"type":"long","logicalType":"timestamp-micros"}}]}'
    )
    codec = EnvelopeAvro(schema)
    for naive in (
        datetime.datetime(2024, 6, 1, 12, 30, 45, 123457),
        # Debezium's far-future infinity sentinel: float division in the
        # decoder would be ~61 µs off at this magnitude (round-4 review
        # finding) — integer math must round-trip exactly.
        datetime.datetime(9999, 12, 31, 23, 59, 59, 999999),
    ):
        back = codec.decode(codec.encode({"ts": naive}))["ts"]
        assert back == naive.replace(tzinfo=datetime.timezone.utc)


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**62), 2**62 - 1)),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
            ),
            st.one_of(st.none(), st.binary(max_size=24)),
            st.one_of(st.none(), st.booleans()),
        ),
        max_size=8,
    )
)
def test_avro_codec_roundtrip_property(rows):
    """Property: encode∘decode is the identity for every nullable
    primitive the codec maps (long, string, double, bytes, boolean) over
    arbitrary values — zigzag negatives, empty strings/bytes, unicode,
    denormals. Hypothesis shrinks failures to minimal rows."""
    import json

    from debezium_emr_hudi_deltastreamer_sample_spark.avro_codec import EnvelopeAvro

    schema = json.dumps(
        {
            "type": "record",
            "name": "P",
            "fields": [
                {"name": n, "type": ["null", t], "default": None}
                for n, t in [
                    ("a", "long"),
                    ("b", "string"),
                    ("c", "double"),
                    ("d", "bytes"),
                    ("e", "boolean"),
                ]
            ],
        }
    )
    codec = EnvelopeAvro(schema)
    for a, b, c, d, e in rows:
        rec = {"a": a, "b": b, "c": c, "d": d, "e": e}
        back = codec.decode(codec.encode(rec))
        assert back == rec


def test_avro_nan_like_nulls_and_corruption_guards():
    """Round-6 review fixes: (1) nan_is_null must treat np.float32 NaN and
    pd.NaT as null (float32 NaN is not a `float` subclass — NULL silently
    encoded as an Avro NaN value; NaT crashed the timestamp math); (2) the
    decoder must raise on truncation and corrupt union indexes instead of
    decoding EOF as False/garbage."""
    import json

    import numpy as np
    import pandas as pd
    import pytest

    from debezium_emr_hudi_deltastreamer_sample_spark.avro_codec import EnvelopeAvro

    schema = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "f", "type": ["null", "float"]},
                {"name": "t", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
                {"name": "b", "type": "boolean"},
            ],
        }
    )
    codec = EnvelopeAvro(schema, nan_is_null=True)
    back = codec.decode(
        codec.encode({"f": np.float32("nan"), "t": pd.NaT, "b": True})
    )
    assert back["f"] is None and back["t"] is None and back["b"] is True
    # A REAL float NaN with nan_is_null OFF stays a value (avrolog lane).
    strict = EnvelopeAvro(schema, nan_is_null=False)
    v = strict.decode(strict.encode({"f": float("nan"), "t": None, "b": False}))
    assert v["f"] != v["f"]  # NaN round-trips as NaN, not null

    full = codec.encode({"f": 1.5, "t": None, "b": True})
    with pytest.raises(IOError):
        codec.decode(full[:-1])  # truncated boolean
    # Corrupt union index: first byte is the f-union branch varint; 0x04
    # zigzag-decodes to 2, out of range for a 2-branch union.
    with pytest.raises(IOError):
        codec.decode(b"\x04" + full[1:])


def test_envelope_reserved_row_columns_rejected(spark):
    """A row schema carrying op/_lsn/_ts_ms would collide with the
    envelope projection (duplicate columns in SQL lanes, silent op
    overwrite in the Python lane) — both lanes must refuse loudly."""
    import pytest
    from pyspark.sql import types as T

    from debezium_emr_hudi_deltastreamer_sample_spark.envelope import (
        parse_envelope,
        parse_envelope_avro_py,
    )

    bad = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("op", T.StringType())]
    )
    raw = spark.createDataFrame([('{"payload": null}',)], "value string")
    with pytest.raises(ValueError, match="reserved envelope column"):
        parse_envelope(raw, row_schema=bad).collect()
    braw = spark.createDataFrame([(b"",)], "value binary")
    with pytest.raises(ValueError, match="reserved envelope column"):
        parse_envelope_avro_py(braw, row_schema=bad)
