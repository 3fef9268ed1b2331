"""Named-table catalog over parquet storage.

The reference lands data as parquet on S3 (README.md:188, 329) and registers
keyed tables in Hive/Glue via Hudi hive-sync (README.md:298-304, 273) so they
are queryable by name. This module is that capability for the engine: load a
directory of parquet tables once with *declared* use — schemas come from the
parquet footers (static, not per-batch inference; fixes SURVEY.md §7.4.1) —
and expose them as temp views for the SQL surface.

Scale note: ``spark.read.parquet`` is a DataSource-v2 scan — column pruning
and predicate pushdown reach the footers for free; with ``partitionBy`` at
write time (io.sinks) partition pruning applies at read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The fixture star schema + stream/LLM tables (TESTDATA.md, FIXTURES.md §1-2).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_read_confs(spark: SparkSession) -> None:
    """Set the session confs the engine's reads depend on, at use-site.

    Both are runtime-settable, so every query is correct on a *default*
    ``SparkSession`` — not only one built by ``session.get_spark()``:

    - ``nanosAsLong``: under Spark ≤4.0 the fixture ``events.ts`` (parquet
      TIMESTAMP(NANOS)) is refused by default (PARQUET_TYPE_ILLEGAL); the
      legacy conf scans it as epoch-nanos long and ``load_table`` converts.
      Spark 4.1 reads NANOS natively as TIMESTAMP_NTZ (µs-truncated) and
      ignores this conf — ``load_table`` handles both shapes.
    - UTC session time: the engine declares UTC timestamp semantics
      (deterministic comparisons against naive-timestamp oracles); it also
      makes the NTZ→LTZ cast below interpretation-free.

    Conf-hygiene contract: these are monotone engine DECLARATIONS — every
    call sets the same two constants, never restores or flips them — so a
    concurrent query on the same session can only ever observe the declared
    values, not a transient. Anything per-replay or value-varying (e.g. the
    streaming state-store fan-out) must instead be scoped to a
    ``newSession()`` child (see queries/streaming._stream_session).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Pushdown/pruning are Catalyst's job.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS). Depending on the
    Spark version it scans as epoch-nanos ``bigint`` (≤4.0 with the legacy
    conf; converted via integer ``div`` so no double-precision loss) or as
    ``timestamp_ntz`` (4.1+; cast to TimestampType under the UTC session
    zone set above — the engine's declared event-time semantics, and what
    watermarks/unix_micros/windowing require). Fixture values are
    µs-resolution → both paths are lossless.
    """
    ensure_read_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (the hive-sync analogue,
    README.md:298-304) so ``spark.sql`` queries run against names."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
