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
