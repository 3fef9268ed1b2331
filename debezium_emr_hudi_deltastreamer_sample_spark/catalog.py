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

    - ``nanosAsLong``: the fixture ``events.ts`` is parquet TIMESTAMP(NANOS),
      which Spark refuses by default (PARQUET_TYPE_ILLEGAL); with the legacy
      conf it scans as epoch-nanos long and ``load_table`` converts.
    - UTC session time: the engine declares UTC timestamp semantics
      (deterministic comparisons against naive-timestamp oracles).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Pushdown/pruning are Catalyst's job.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it scans as epoch-nanos long
    and is converted here to a proper TimestampType (integer ``div`` so no
    double-precision loss; fixture values are µs-resolution → lossless).
    """
    ensure_read_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
