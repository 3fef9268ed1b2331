"""Custom Spark DATA SOURCE in pure Python (Spark 4 Python Data Source
API) — the extension point the engine uses where a feed has no built-in
reader (an internal changefeed service, a proprietary scan API, a paged
REST endpoint).

`ChangefeedDataSource` is a deterministic synthetic CDC feed: every row
is a pure function of its index, so an oracle can recompute the exact
content — which makes the SOURCE MACHINERY itself (registration, schema
declaration, partition planning, per-partition iteration, filter
pushdown) the thing under test, not the data.

Scale design: `partitions()` splits the index range into
``partitions`` independent `InputPartition`s — Spark schedules one task
per partition, so the source parallelizes like any file scan; `read`
yields plain tuples (Arrow-batched by the runtime). `pushFilters`
(Spark 4.1) accepts equality filters on ``op`` so a filtered read
skips generating non-matching rows at the SOURCE — the Python-source
analogue of parquet predicate pushdown.

Cites reference README.md:170-204 (the Kafka scan this stands in for:
a partitioned, offset-addressed changefeed).
"""

from __future__ import annotations

import math

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def row_at(i: int):
    """The feed's content contract: row i, engine- and oracle-replayable."""
    op = "d" if i % 10 == 0 else ("u" if i % 10 == 5 else "c")
    return (op, i, i % 97, ((i * 31) % 1000) / 10.0)


class ChangefeedReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "8"))
        self.op_filter: str | None = None

    def pushFilters(self, filters):
        from pyspark.sql.datasource import EqualTo

        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("op",):
                self.op_filter = f.value
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self):
        step = max(1, math.ceil(self.n_rows / self.n_parts))
        return [
            _Range(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            row = row_at(i)
            if self.op_filter is not None and row[0] != self.op_filter:
                continue
            yield row


class ChangefeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "changefeed"

    def schema(self) -> str:
        return "op string, lsn bigint, key bigint, amount double"

    def reader(self, schema) -> ChangefeedReader:
        return ChangefeedReader(self.options)

    def streamReader(self, schema) -> "ChangefeedStreamReader":
        return ChangefeedStreamReader(self.options)


class ChangefeedStreamReader(DataSourceStreamReader):
    """Streaming lane of the changefeed source — the Python-source
    analogue of the reference's Kafka scan (A1, README.md:191-194):
    offset-addressed micro-batches with replay semantics.

    Offsets are plain dicts ({"index": n}) checkpointed by the engine;
    `latestOffset` advances the cursor by at most ``batch_rows`` per
    trigger (Kafka's maxOffsetsPerTrigger analogue), `partitions`
    splits each [start, end) window into independent tasks, and a
    restarted query re-enters at the checkpointed offset — `read` is a
    pure function of the range, so replays are exact. `commit` is the
    ack hook (a real feed would trim its retention there)."""

    def __init__(self, options):
        self.total = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batch_rows", "250"))
        self.n_parts = int(options.get("partitions", "4"))
        self._pos = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._pos = min(self.total, self._pos + self.batch_rows)
        return {"index": self._pos}

    def partitions(self, start, end):
        lo, hi = start["index"], end["index"]
        step = max(1, math.ceil((hi - lo) / self.n_parts))
        return [_Range(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield row_at(i)

    def commit(self, end):
        pass  # ack-only; synthetic feed has no retention to trim


def register_changefeed(spark) -> None:
    """Idempotent registration: Spark raises DATA_SOURCE_ALREADY_EXISTS on
    a duplicate name, and two queries in one session (or a session and its
    newSession children, which share the registry) both need the source."""
    try:
        spark.dataSource.register(ChangefeedDataSource)
    except Exception as e:  # noqa: BLE001
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise
