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
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
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

        # Consume at most ONE op equality. Claiming several and keeping
        # only the last would be a wrong-results bug: Spark removes every
        # consumed predicate from the plan, so `op = 'c' AND op = 'd'`
        # (correct answer: zero rows) would scan with just op = 'd'. The
        # extras stay unsupported and Spark re-applies them post-scan.
        unsupported = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("op",)
                and self.op_filter is None
            ):
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
    trigger (Kafka's maxOffsetsPerTrigger analogue) and `partitions`
    splits each [start, end) window into independent tasks — `read` is a
    pure function of the range, so replays of an explicit window are
    exact.

    Restart correctness: this API never tells the reader the
    checkpointed offset (a fresh planner process calls `latestOffset`
    first), so a purely in-memory cursor would regress and re-emit
    committed rows. The reader therefore persists its high-water mark
    from the `commit` ack into ``cursor_dir`` (atomic tmp+rename) and
    floors the cursor at it on startup — the same move Kafka's group
    offsets or a feed's server-side cursor make. Without ``cursor_dir``
    the source is exact within one run and documents that restart
    resume requires it."""

    def __init__(self, options):
        self.total = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batch_rows", "250"))
        self.n_parts = int(options.get("partitions", "4"))
        self.cursor_dir = options.get("cursor_dir")
        self._pos = self._read_cursor()
        #: Frozen at construction: initialOffset must report where THIS
        #: run starts, immune to latestOffset/partitions having already
        #: advanced the pacing cursor (Spark may probe availability before
        #: asking for the initial offset).
        self._initial = self._pos

    def _cursor_file(self):
        import os

        return os.path.join(self.cursor_dir, "cursor.json") if self.cursor_dir else None

    def _read_cursor(self) -> int:
        import json as _json

        f = self._cursor_file()
        if not f:
            return 0
        try:
            with open(f) as fh:
                return int(_json.load(fh)["index"])
        except Exception:
            return 0

    def initialOffset(self):
        # A FRESH checkpoint must resume from the persisted cursor, not
        # from zero: with cursor_dir set, index 0 on restart would re-emit
        # every already-committed row in one over-sized first batch (the
        # exact duplicate-delivery the durable cursor exists to prevent).
        # The construction-time snapshot (not _pos) keeps this stable even
        # when Spark calls latestOffset before initialOffset.
        return {"index": self._initial}

    def latestOffset(self):
        self._pos = min(self.total, self._pos + self.batch_rows)
        return {"index": self._pos}

    def partitions(self, start, end):
        lo, hi = start["index"], end["index"]
        # A replayed/observed window also advances the in-memory cursor —
        # belt next to the cursor-file braces.
        self._pos = max(self._pos, hi)
        step = max(1, math.ceil((hi - lo) / self.n_parts))
        return [_Range(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield row_at(i)

    def commit(self, end):
        """Ack: durably record the committed high-water mark (a real feed
        would also trim retention here)."""
        import json as _json
        import os
        import uuid as _uuid

        f = self._cursor_file()
        if not f:
            return
        os.makedirs(self.cursor_dir, exist_ok=True)
        tmp = f + f".{_uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            _json.dump({"index": int(end["index"])}, fh)
        os.replace(tmp, f)


def register_changefeed(spark) -> None:
    """Idempotent registration: Spark raises DATA_SOURCE_ALREADY_EXISTS on
    a duplicate name, and two queries in one session (or a session and its
    newSession children, which share the registry) both need the source."""
    try:
        spark.dataSource.register(ChangefeedDataSource)
    except Exception as e:  # noqa: BLE001
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise


# ------------------------------------------------------------ avrolog format


class _FileCommit(WriterCommitMessage):
    def __init__(self, temp_name: str):
        self.temp_name = temp_name


class AvroLogWriter(DataSourceWriter):
    """Per-task writer of the `avrolog` format: length-prefixed Avro
    records (the engine's pure-Python codec) in flat part files. Two-phase
    commit, the thing this API exists for: each task writes a TEMP-named
    file and reports it in its commit message; only `commit` (driver,
    all-tasks-succeeded) renames temps to visible part files, and `abort`
    deletes them — a retried/failed task's output can never leak into a
    reader's listing."""

    def __init__(self, path: str, avro_schema_json: str, overwrite: bool):
        self.path = path
        self.avro_schema_json = avro_schema_json
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import struct as _struct
        import uuid as _uuid

        from ..avro_codec import EnvelopeAvro

        codec = EnvelopeAvro(self.avro_schema_json)
        os.makedirs(self.path, exist_ok=True)
        temp = os.path.join(self.path, f"_temp-{_uuid.uuid4().hex}.avrolog")
        with open(temp, "wb") as f:
            for row in iterator:
                body = codec.encode(row.asDict(recursive=True))
                f.write(_struct.pack("<I", len(body)))
                f.write(body)
        return _FileCommit(os.path.basename(temp))

    @staticmethod
    def _sweep_stray_temps(path, keep: set) -> None:
        """Delete _temp files no commit message references: failed or
        speculative task attempts leave orphans behind (their messages
        never reach commit), and on a long-running stream they accumulate
        unboundedly. Runs at COMMIT time only — every task attempt of the
        committing job has finished, so anything still temp-named is
        garbage from this or an earlier failed job. (Single concurrent
        writer per directory, which the batch-id-keyed commit protocol
        already assumes.)"""
        import os

        for name in os.listdir(path):
            if name.startswith("_temp-") and name not in keep:
                try:
                    os.remove(os.path.join(path, name))
                except FileNotFoundError:
                    pass

    def commit(self, messages):
        import os

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") and name.endswith(".avrolog"):
                    os.remove(os.path.join(self.path, name))
        for m in messages:
            if m is None:
                continue
            final = m.temp_name.replace("_temp-", "part-", 1)
            os.rename(
                os.path.join(self.path, m.temp_name),
                os.path.join(self.path, final),
            )
        self._sweep_stray_temps(self.path, set())

    def abort(self, messages):
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.temp_name))
            except FileNotFoundError:
                pass


class _AvroLogFile(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class AvroLogReader(DataSourceReader):
    """One input partition per part file; each task streams its file's
    length-prefixed records through the codec."""

    def __init__(self, path: str, avro_schema_json: str, field_names):
        self.path = path
        self.avro_schema_json = avro_schema_json
        self.field_names = list(field_names)

    def partitions(self):
        import os

        return [
            _AvroLogFile(os.path.join(self.path, n))
            for n in sorted(os.listdir(self.path))
            if n.startswith("part-") and n.endswith(".avrolog")
        ]

    def read(self, partition: _AvroLogFile):
        import struct as _struct

        from ..avro_codec import EnvelopeAvro

        codec = EnvelopeAvro(self.avro_schema_json)
        with open(partition.file_path, "rb") as f:
            while True:
                head = f.read(4)
                if not head:
                    break
                if len(head) < 4:
                    raise IOError(
                        f"truncated avrolog record header in {partition.file_path}"
                    )
                (n,) = _struct.unpack("<I", head)
                body = f.read(n)
                if len(body) < n:
                    # A short body means the file was cut mid-record —
                    # decoding the fragment would raise a confusing varint
                    # error or, worse, yield garbage values.
                    raise IOError(
                        f"truncated avrolog record body in {partition.file_path}"
                        f" (expected {n} bytes, got {len(body)})"
                    )
                rec = codec.decode(body)
                yield tuple(rec.get(k) for k in self.field_names)


class AvroLogDataSource(DataSource):
    """A COMPLETE custom file format in pure Python (Spark 4 Python Data
    Source API, both directions): rows ⇄ length-prefixed Avro records
    (avro_codec.EnvelopeAvro — the same codec as the CDC wire), task-level
    two-phase commit on write, one task per part file on read. The shape
    a proprietary internal format takes when wired into Spark without a
    JVM connector. The row schema rides in the `ddl` option (write: taken
    from the DataFrame; read: declared — inference would be a full extra
    pass)."""

    @classmethod
    def name(cls) -> str:
        return "avrolog"

    def schema(self) -> str:
        return self.options["ddl"]

    def _avro_json(self, schema) -> str:
        import json as _json

        from ..envelope import _avro_type

        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            schema = _parse_datatype_string(schema)
        return _json.dumps(_avro_type(schema, "Row", "avrolog"))

    def reader(self, schema) -> AvroLogReader:
        if hasattr(schema, "fields"):
            names = [f.name for f in schema.fields]
        else:
            # Real DDL parsing — naive comma-splitting breaks on
            # parameterized types like decimal(10,2).
            from pyspark.sql.types import _parse_datatype_string

            names = _parse_datatype_string(schema).fieldNames()
        return AvroLogReader(
            self.options["path"], self._avro_json(schema), names
        )

    def writer(self, schema, overwrite: bool) -> AvroLogWriter:
        return AvroLogWriter(
            self.options["path"], self._avro_json(schema), overwrite
        )

    def streamWriter(self, schema, overwrite: bool) -> "AvroLogStreamWriter":
        import os

        os.makedirs(self.options["path"], exist_ok=True)
        return AvroLogStreamWriter(self.options["path"], self._avro_json(schema))


def register_avrolog(spark) -> None:
    """Idempotent registration (see register_changefeed)."""
    try:
        spark.dataSource.register(AvroLogDataSource)
    except Exception as e:  # noqa: BLE001
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise


class AvroLogStreamWriter(DataSourceStreamWriter):
    """Streaming sink lane of the avrolog format — completes the custom
    extension-point matrix (batch read/write, stream read, stream WRITE).
    Same two-phase protocol as the batch writer, extended with the
    micro-batch id: tasks stage temp files; `commit(messages, batchId)`
    renames them to ``part-b<batchId>-…`` — so a REPLAYED batch id
    overwrites its own part files instead of duplicating them (the
    exactly-once idiom every engine sink here uses: the batch id IS the
    idempotency key); `abort` discards the stage."""

    def __init__(self, path: str, avro_schema_json: str):
        self.path = path
        self.avro_schema_json = avro_schema_json

    def write(self, iterator):
        return AvroLogWriter(self.path, self.avro_schema_json, False).write(
            iterator
        )

    def commit(self, messages, batchId) -> None:
        import os

        # Idempotent replay: clear this batch id's previous part files.
        for name in os.listdir(self.path):
            if name.startswith(f"part-b{batchId:012d}-"):
                os.remove(os.path.join(self.path, name))
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-b{batchId:012d}-{i:05d}.avrolog"
            os.rename(
                os.path.join(self.path, m.temp_name),
                os.path.join(self.path, final),
            )
        AvroLogWriter._sweep_stray_temps(self.path, set())

    def abort(self, messages, batchId) -> None:
        AvroLogWriter(self.path, self.avro_schema_json, False).abort(messages)
