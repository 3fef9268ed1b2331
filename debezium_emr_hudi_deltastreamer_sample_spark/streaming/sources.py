"""Streaming sources.

The reference's only source is Kafka (`readStream.format("kafka")` with
`subscribePattern "debezium1.*"`, /root/reference/README.md:191-194,
331-334). ``kafka_source`` reproduces that configuration; since no broker
ships in this container, ``file_envelope_source`` is the test double the
rebuild test strategy calls for (SURVEY.md §5): a file-based stream with the
*same record schema* Kafka produces, so every downstream operator is
source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The fixed Kafka record relation (SURVEY.md §1.3): what format("kafka")
#: yields and what the file double must mimic.
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)

#: Shape of the JSON lines the file double reads (value as string; cast to
#: binary to match Kafka exactly).
_FILE_DOUBLE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe_pattern: str = "debezium1.*",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka streaming scan exactly as the reference configures it
    (README.md:191-194: subscribePattern regex = one topic per source table;
    README.md:312 auto.offset.reset=earliest ⇒ startingOffsets=earliest,
    reference B13 bootstrap replay).

    ``max_offsets_per_trigger`` bounds micro-batch size — the backpressure
    knob the reference leaves unset (ASAP batches, SURVEY.md §4) and a 100 TB
    deployment must set.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", subscribe_pattern)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def file_envelope_source(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based Kafka double: reads JSON-lines files of Kafka-shaped
    records and yields the exact `kafka` source relation (schema declared,
    never inferred — SURVEY.md §7.4.1). ``max_files_per_trigger=1`` makes
    each file one micro-batch, which is how tests script batch boundaries.
    """
    reader = spark.readStream.schema(_FILE_DOUBLE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.json(path)
    return df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.lit(0).alias("timestampType"),
    )


def rate_source(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Built-in rate source — load/latency harness double."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def kafka_record_projection(
    df: DataFrame,
    key_col: str | None = None,
    value_col: str = "value",
    topic: str | None = None,
) -> DataFrame:
    """Shape arbitrary rows into Kafka writer records: string/binary
    ``key``/``value`` (+ optional per-row ``topic``). Non-string values are
    JSON-serialized via to_json(struct(*)) — the envelope shape a Debezium
    consumer downstream of this engine would expect."""

    if value_col in df.columns:
        value = F.col(value_col).cast("string")
    else:
        value = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    cols = [value.alias("value")]
    if key_col is not None:
        cols.append(F.col(key_col).cast("string").alias("key"))
    if topic is not None:
        cols.append(F.lit(topic).alias("topic"))
    return df.select(*cols)


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
):
    """Kafka streaming sink — the write-side mirror of `kafka_source`
    (the reference only consumes; a complete engine also re-publishes,
    e.g. enriched streams or outbox patterns). Returns the configured
    DataStreamWriter; the caller `.start()`s it where a broker exists —
    keeping construction broker-free makes it unit-testable in this
    environment (no Kafka)."""
    records = kafka_record_projection(df, key_col=key_col)
    return (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
