"""Incremental rollup maintenance (continuous aggregation): keep a
time-bucketed aggregate table up to date from append batches without ever
re-scanning history — the "hypertable rollup" pattern for 100 TB event
streams.

The trick is additivity: maintain (count, sum, min, max) partials per (bucket, keys);
each micro-batch aggregates ITSELF (map-side partials, tiny output), then
merges with the stored rollup by summing partials per group. Derived
metrics (avg) are computed at read time. Cost per batch is O(batch) + a
rollup-sized merge, independent of total history; the rollup table is
bucket-count sized, not event-count sized.

Use from ``foreachBatch`` (the engine's CDC shape, SURVEY.md §7.4.5) or
standalone on batch appends.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalRollup:
    """Additive (count/sum/min/max) rollup of an event stream at a fixed time
    bucket, persisted as parquet at ``path``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        ts_col: str,
        bucket: str,
        keys: Sequence[str],
        value_col: str,
    ) -> None:
        self.spark = spark
        self.path = path
        self.ts_col = ts_col
        self.bucket = bucket
        self.keys = list(keys)
        self.value_col = value_col

    def _partials(self, df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.window(self.ts_col, self.bucket).alias("w"), *self.keys
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(self.value_col).cast("double")).alias("total"),
                F.min(F.col(self.value_col).cast("double")).alias("vmin"),
                F.max(F.col(self.value_col).cast("double")).alias("vmax"),
            )
            .select(
                F.col("w.start").alias("bucket_start"),
                *self.keys,
                "n",
                "total",
                "vmin",
                "vmax",
            )
        )

    def _applied_batch_path(self) -> str:
        return f"{self.path}__applied"

    def last_applied_batch(self) -> int:
        try:
            row = self.spark.read.parquet(self._applied_batch_path()).first()
            return int(row[0]) if row is not None else -1
        except Exception:
            return -1

    def apply_batch(self, df: DataFrame, batch_id: int = 0) -> None:
        """Fold one append batch into the rollup.

        Idempotent under foreachBatch's at-least-once replay: the additive
        merge would DOUBLE-COUNT a replayed batch, so the last applied
        batch_id is persisted next to the table and duplicate/stale ids
        are skipped — the standard transactional-foreachBatch-sink pattern
        (Structured Streaming batch ids are monotone per checkpoint)."""
        if batch_id <= self.last_applied_batch():
            return
        partial = self._partials(df)
        try:
            current = self.spark.read.parquet(self.path)
            merged = (
                current.unionByName(partial)
                .groupBy("bucket_start", *self.keys)
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("total").alias("total"),
                    F.min("vmin").alias("vmin"),
                    F.max("vmax").alias("vmax"),
                )
            )
        except Exception:
            merged = partial
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.path)
        # spark.range, not createDataFrame([...]): writing a Python
        # local-relation DataFrame costs seconds per call (Arrow/py4j
        # round-trip on the write path); the JVM-side range is ~20 ms.
        self.spark.range(batch_id, batch_id + 1).selectExpr(
            "id AS last_batch_id"
        ).coalesce(1).write.mode("overwrite").parquet(self._applied_batch_path())

    def processor(self):
        """foreachBatch-compatible callable."""

        def process(df: DataFrame, batch_id: int) -> None:
            self.apply_batch(df, batch_id)

        return process

    def read(self) -> DataFrame:
        """Rollup with derived metrics (avg from the additive partials)."""
        r = self.spark.read.parquet(self.path)
        return r.withColumn("mean", F.col("total") / F.col("n"))
