"""Debezium change-event envelope: declared schema + parser.

The reference consumes the envelope with per-micro-batch schema inference
(`spark.read.json(df.rdd.map(lambda row: row.value)).schema`,
/root/reference/README.md:179, 320) — which crashes on empty batches and
infers `after` as null-type on all-delete batches (SURVEY.md §7.4.1). Here
the envelope is a *declared* StructType per registered table: `from_json`
against it never needs an inference pass, deletes parse correctly, and empty
batches are no-ops.

Envelope shape pinned by the reference's own consumption
(README.md:183-184, 324-325: ``col("json.payload.after.id")``) and its
Debezium config (README.md:260 ``tombstones.on.delete=false`` ⇒ deletes are
ordinary records with ``op='d'`` and ``after=null``; README.md:348
``--source-ordering-field _event_lsn`` ⇒ total order per key is the WAL LSN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The reference source table (README.md:50-53, generator.py:25-34,
#: table_structure.png): id serial PK, 4 text cols, int salary, date.
EMPLOYEES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("department", T.StringType()),
        T.StructField("salary", T.IntegerType()),
        T.StructField("created_at", T.DateType()),
    ]
)

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("table", T.StringType()),
    ]
)


def envelope_schema(row_schema: T.StructType = EMPLOYEES_SCHEMA) -> T.StructType:
    """Envelope StructType for a given source-row schema (SURVEY.md §1.2)."""
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("before", row_schema),
                        T.StructField("after", row_schema),
                        T.StructField("source", SOURCE_SCHEMA),
                        T.StructField("op", T.StringType()),
                        T.StructField("ts_ms", T.LongType()),
                    ]
                ),
            )
        ]
    )


def parse_envelope(
    raw: DataFrame,
    row_schema: T.StructType = EMPLOYEES_SCHEMA,
    value_col: str = "value",
) -> DataFrame:
    """Kafka-shaped records → flat change rows.

    Reference lifecycle README.md:182-185 (cast, from_json, nested project,
    drop), with the delete fix of SURVEY.md §7.4.4: delete events keep
    before-image keys so downstream merge can apply them — the reference's
    own projection would emit null ids for deletes.

    Output: one row per change event with columns
    ``op, _lsn, _ts_ms`` + the row schema fields (after-image for c/u/r,
    before-image for d).
    """
    schema = envelope_schema(row_schema)
    parsed = raw.withColumn("json", F.from_json(F.col(value_col).cast("string"), schema))
    return project_envelope(parsed, "json")


def project_envelope(
    parsed: DataFrame, env_col: str, payload_wrapped: bool = True
) -> DataFrame:
    """Flatten an ALREADY-PARSED envelope struct column into change rows —
    the projection half of ``parse_envelope``, factored out so a caller
    that needs both the raw bytes and the parsed struct (e.g. dead-letter
    routing) can run ``from_json`` ONCE and reuse the result for the DLQ
    split and the merge. ``payload_wrapped=False`` serves the Avro lane,
    whose envelope has no ``payload`` wrapper (AvroConverter shape) —
    ONE projection definition for both wire formats, so delete-awareness
    and metadata columns cannot drift between them."""
    base = f"{env_col}.payload" if payload_wrapped else env_col
    img = F.when(
        F.col(f"{base}.op") == "d", F.col(f"{base}.before")
    ).otherwise(F.col(f"{base}.after"))
    out = parsed.withColumn("_row", img)
    # The projection prepends op/_lsn/_ts_ms next to `_row.*`: a row
    # schema carrying one of those names would emit a duplicate column
    # (AMBIGUOUS_REFERENCE downstream) — refuse loudly, like the
    # merge-layer's _reject_reserved.
    row_fields = {f.name for f in out.schema["_row"].dataType.fields}
    clash = row_fields & {"op", "_lsn", "_ts_ms", "_row"}
    if clash:
        raise ValueError(
            f"row schema carries reserved envelope column(s) "
            f"{sorted(clash)}; rename them before ingesting"
        )
    return (
        out.select(
            F.col(f"{base}.op").alias("op"),
            F.col(f"{base}.source.lsn").alias("_lsn"),
            F.col(f"{base}.ts_ms").alias("_ts_ms"),
            F.col("_row.*"),
        )
        # Defensive: malformed JSON → from_json yields null payload; drop.
        .filter(F.col("op").isNotNull())
    )


def topic_to_table(topic_col: str = "topic"):
    """Derive table name from a Debezium topic ``<prefix>.<schema>.<table>``
    (reference B14: ``debezium1.public.employees``, README.md:104)."""
    return F.element_at(F.split(F.col(topic_col), r"\."), -1)


#: Spark type → Avro type for the envelope field kinds Debezium emits.
_AVRO_PRIMITIVES: dict[type, object] = {
    T.IntegerType: "int",
    T.LongType: "long",
    T.StringType: "string",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
    T.DateType: {"type": "int", "logicalType": "date"},
    T.TimestampType: {"type": "long", "logicalType": "timestamp-micros"},
}


def _avro_type(dt: T.DataType, name: str, namespace: str):
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name,
            "namespace": namespace,
            "fields": [
                {
                    "name": f.name,
                    # Debezium marks every column optional in the envelope
                    # (before/after images may be absent): null-union with
                    # null default, the Avro idiom AvroConverter emits.
                    "type": ["null", _avro_type(f.dataType, f.name.capitalize(), namespace)],
                    "default": None,
                }
                for f in dt.fields
            ],
        }
    for spark_t, avro_t in _AVRO_PRIMITIVES.items():
        if isinstance(dt, spark_t):
            return avro_t
    raise TypeError(f"no Avro mapping for Spark type {dt.simpleString()}")


def envelope_avro_schema(
    row_schema: T.StructType = EMPLOYEES_SCHEMA,
    namespace: str = "debezium1.public",
) -> str:
    """Debezium-shaped Avro schema JSON for the change envelope.

    Unlike the JSON path there is NO ``payload`` wrapper: the schema/payload
    nesting is a JsonConverter artifact, while AvroConverter (reference
    README.md:262-263, 309) serializes the envelope record itself —
    ``before``/``after`` as nullable row records, ``source`` (lsn/ts_ms/
    table), ``op``, ``ts_ms``. Generated from the same declared
    ``row_schema`` as ``envelope_schema`` so the two serde paths cannot
    drift apart."""
    import json

    env = T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("source", SOURCE_SCHEMA),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    schema = _avro_type(env, "Envelope", namespace)
    # before/after are the same record type; Avro forbids redefining a
    # named type, so the second occurrence must reference it by name.
    fields = schema["fields"]
    assert fields[0]["name"] == "before" and fields[1]["name"] == "after"
    fields[0]["type"][1]["name"] = "Value"
    fields[1]["type"] = ["null", f"{namespace}.Value"]
    return json.dumps(schema)


_AVRO_PROBE_CACHE: dict[str, bool] = {}


def avro_available(spark) -> bool:
    """Probe for the spark-avro data source (reference B4: the Hudi path is
    Avro-serialized — AvroConverter/KafkaAvroDeserializer, README.md:262-263,
    309; the reference's own submit line ships spark-avro, README.md:348).
    The package is an external jar, absent in this container.

    Cached per application: the probe is a real Spark job (range +
    to_avro + head) and the jar cannot appear or disappear within a
    session — paying it once, not per micro-batch."""
    app_id = spark.sparkContext.applicationId
    if app_id in _AVRO_PROBE_CACHE:
        return _AVRO_PROBE_CACHE[app_id]
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct(F.col("id"))).alias("b")
        ).head(1)
        _AVRO_PROBE_CACHE[app_id] = True
    except Exception:
        _AVRO_PROBE_CACHE[app_id] = False
    return _AVRO_PROBE_CACHE[app_id]


def parse_envelope_avro(
    raw: DataFrame,
    avro_schema_json: str | None = None,
    row_schema: T.StructType = EMPLOYEES_SCHEMA,
    value_col: str = "value",
) -> DataFrame:
    """Avro-serialized envelope path (README.md:262-263): ``from_avro`` on
    the Kafka value, then the same delete-aware projection as the JSON
    path. The schema defaults to ``envelope_avro_schema(row_schema)``; note
    the Avro envelope has NO ``payload`` wrapper (that nesting is a
    JsonConverter artifact), so the projection reads top-level fields.
    Requires the spark-avro package (``avro_available``) — raises a clear
    error instead of failing deep inside py4j when it's absent.

    Note: Confluent wire format prepends a 5-byte schema-id header which
    must be stripped before ``from_avro`` (``substring(value, 6, ...)``) —
    callers using a schema registry pass ``confluent_header=True``-shaped
    data through ``F.expr("substring(value, 6, length(value)-5)")`` first.
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except Exception as exc:  # pragma: no cover - import itself succeeds in 4.x
        raise RuntimeError("spark-avro package not loaded") from exc
    if not avro_available(raw.sparkSession):
        raise RuntimeError(
            "spark-avro data source not loaded; restart with the spark-avro "
            "package (reference README.md:348 ships it via --packages)"
        )
    if avro_schema_json is None:
        avro_schema_json = envelope_avro_schema(row_schema)
    parsed = raw.withColumn(
        "env",
        from_avro(
            F.col(value_col), avro_schema_json, {"mode": "PERMISSIVE"}
        ),
    )
    return project_envelope(parsed, "env", payload_wrapped=False)


def parse_envelope_avro_py(
    raw: DataFrame,
    avro_schema_json: str | None = None,
    row_schema: T.StructType = EMPLOYEES_SCHEMA,
    value_col: str = "value",
    confluent_header: bool = False,
) -> DataFrame:
    """Avro-binary envelope decode WITHOUT the spark-avro jar: the engine's
    own pure-Python Avro reader (avro_codec.EnvelopeAvro) runs inside
    mapInPandas — Arrow batches of (value: binary) in, the same flat change
    rows as `parse_envelope` out (op, _lsn, _ts_ms + row fields;
    before-image for deletes). Same output contract as
    `parse_envelope_avro`, so callers can fall back transparently when
    `avro_available` is False (this container).

    Scale note: this is the slow lane — a per-record Python decode, Arrow
    only at the batch boundary. With the jar present prefer
    `parse_envelope_avro` (JVM-side from_avro, codegen projection). It
    exists because the Avro SEMANTICS (schema shape, union nulls, logical
    dates, delete before-images) must be testable and usable without an
    external package. ``confluent_header=True`` strips the 5-byte schema
    registry prefix per record (explicit, not sniffed — an Avro body can
    legitimately begin with 0x00)."""
    from collections.abc import Iterator

    import pandas as pd

    from .avro_codec import EnvelopeAvro

    if avro_schema_json is None:
        avro_schema_json = envelope_avro_schema(row_schema)
    out_schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("_lsn", T.LongType()),
            T.StructField("_ts_ms", T.LongType()),
            *row_schema.fields,
        ]
    )
    row_fields = [f.name for f in row_schema.fields]
    clash = set(row_fields) & {"op", "_lsn", "_ts_ms"}
    if clash:
        # The output dict merge would silently OVERWRITE the envelope op
        # with the row field's value (a delete mis-merged as an upsert) —
        # same reserved-name contract as project_envelope.
        raise ValueError(
            f"row schema carries reserved envelope column(s) "
            f"{sorted(clash)}; rename them before ingesting"
        )
    cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = EnvelopeAvro(avro_schema_json)
        for pdf in batches:
            rows = []
            for blob in pdf[value_col]:
                if blob is None:
                    # Kafka tombstone / null value: the JSON lane filters
                    # these via the null-op predicate; crashing the task
                    # on bytes(None) is not an option.
                    continue
                b = bytes(blob)
                if confluent_header:
                    b = b[5:]
                try:
                    env = codec.decode(b)
                except Exception:
                    continue  # defensive: malformed record, mirror JSON path
                if env.get("op") is None:
                    # Contract parity with parse_envelope / parse_envelope_avro,
                    # which both filter op IS NOT NULL — a null-op envelope
                    # must not surface as an implicit upsert under fallback.
                    continue
                img = env.get("before") if env.get("op") == "d" else env.get("after")
                img = img or {}
                src = env.get("source") or {}
                rows.append(
                    {
                        "op": env.get("op"),
                        "_lsn": src.get("lsn"),
                        "_ts_ms": env.get("ts_ms"),
                        **{k: img.get(k) for k in row_fields},
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return raw.select(value_col).mapInPandas(run, out_schema)


def encode_envelope_avro_py(
    flat: DataFrame,
    avro_schema_json: str | None = None,
    row_schema: T.StructType = EMPLOYEES_SCHEMA,
    table: str = "employees",
    value_col: str = "value",
) -> DataFrame:
    """Inverse of `parse_envelope_avro_py`: flat change rows (``op``,
    ``_lsn``, ``_ts_ms`` + row fields) → one Avro-binary envelope record
    per row (deletes carry the before-image, everything else the after-
    image — the AvroConverter shape, reference README.md:262-263). The
    pure-Python writer (avro_codec.EnvelopeAvro) runs inside mapInPandas,
    so REAL Avro bytes are producible in-container without spark-avro;
    with the jar present, `to_avro` on a struct column is the JVM lane.

    The encoder is the load-generator / sink side of the serde pair — the
    engine can both emit and ingest the wire format, and the graded
    `cdc_avro_roundtrip` query pushes rows through encode → decode to
    prove the two sides are exact inverses."""
    from collections.abc import Iterator

    import pandas as pd

    from .avro_codec import EnvelopeAvro

    if avro_schema_json is None:
        avro_schema_json = envelope_avro_schema(row_schema)
    row_fields = [f.name for f in row_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # nan_is_null: THIS lane feeds pandas records, where a nullable
        # numeric NULL arrives as NaN; the plain-Row avrolog lane keeps
        # the flag off (there NaN is a real double value).
        codec = EnvelopeAvro(avro_schema_json, nan_is_null=True)
        for pdf in batches:
            blobs = []
            for rec in pdf.to_dict("records"):
                img = {k: rec.get(k) for k in row_fields}
                # Default 'c' only when the batch carries no op column at
                # all (snapshot encode); an EXPLICIT null op must stay
                # null — the decode lanes drop it by contract, and
                # upgrading it to a create would fabricate an upsert.
                op = rec["op"] if "op" in rec else "c"
                envd = {
                    "before": img if op == "d" else None,
                    "after": None if op == "d" else img,
                    "source": {
                        "lsn": rec.get("_lsn"),
                        "ts_ms": rec.get("_ts_ms"),
                        "table": table,
                    },
                    "op": op,
                    "ts_ms": rec.get("_ts_ms"),
                }
                blobs.append(codec.encode(envd))
            yield pd.DataFrame({value_col: blobs})

    return flat.mapInPandas(run, f"{value_col} binary")
