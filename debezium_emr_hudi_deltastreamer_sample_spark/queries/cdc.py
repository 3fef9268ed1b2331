"""CDC semantics as oracle-checkable batch queries (SURVEY.md §2.B).

The reference's change-data capabilities — precombine/latest-wins, delete
application, merge, envelope parse, LSN ordering, topic→table naming — run
here as batch operators over the `events` fixture so the DuckDB oracle can
check them. The full envelope/streaming paths are exercised in tests/ with
synthesized change logs (FIXTURES.md §3).

`events` stands in for the change stream: user_id = record key, ts = LSN
analogue (monotone per key), event_type='error' plays op='d'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as _t
from ..functions import dround
from ..operators.asof import asof_join
from ..operators.merge import apply_deletes, latest_by_key, merge_upsert

from ._registry import make_registry

QUERIES, ORACLES, _q = make_registry()

_CUTOVER = "2024-01-15 00:00:00"


@_q(
    "cdc_latest_by_key",
    """
    SELECT user_id, event_id, event_type, round(value, 2) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precombine: newest record per key (reference B5/B6,
    ``hoodie...precombine.field``, README.md:306)."""
    ev = _t(spark, sf_dir, "events")
    return latest_by_key(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", dround("value", 2).alias("value")
    )


@_q(
    "cdc_apply_deletes",
    """
    WITH last AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT e.user_id, count(*) AS n_events, round(sum(e.value), 2) AS total_value
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM last d
                      WHERE d.user_id = e.user_id AND d.rn = 1
                        AND d.event_type = 'error')
    GROUP BY e.user_id
    """,
)
def cdc_apply_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete application (reference B8): a key whose *latest* change is a
    tombstone ('error' ≙ op='d') is dropped via anti-join — exactly the
    CDC shape where the newest event decides liveness."""
    ev = _t(spark, sf_dir, "events")
    tombstones = latest_by_key(ev, ["user_id"], ["ts", "event_id"]).filter(
        F.col("event_type") == "error"
    )
    return (
        apply_deletes(ev, tombstones, ["user_id"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("total_value"),
        )
    )


@_q(
    "cdc_merge_upsert",
    f"""
    WITH snap AS (
      SELECT user_id, event_id, event_type, value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) rn
            FROM events WHERE ts < TIMESTAMP '{_CUTOVER}')
      WHERE rn = 1),
    chg AS (
      SELECT user_id, event_id, event_type, value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) rn
            FROM events WHERE ts >= TIMESTAMP '{_CUTOVER}')
      WHERE rn = 1)
    SELECT coalesce(c.user_id, s.user_id)      AS user_id,
           coalesce(c.event_id, s.event_id)    AS event_id,
           coalesce(c.event_type, s.event_type) AS event_type,
           round(coalesce(c.value, s.value), 2) AS value
    FROM snap s FULL OUTER JOIN chg c ON s.user_id = c.user_id
    WHERE coalesce(c.event_type, '') <> 'error'
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full upsert lifecycle (reference B5+B8+B11, the DeltaStreamer intent
    of README.md:348 / SURVEY.md §3.2): snapshot before the cutover, change
    batch after it, latest-wins merge with 'error' acting as op='d'."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit(_CUTOVER).cast("timestamp")
    snap = latest_by_key(
        ev.filter(F.col("ts") < cut), ["user_id"], ["ts", "event_id"]
    ).select("user_id", "event_id", "event_type", "value")
    changes = ev.filter(F.col("ts") >= cut).withColumn(
        "op", F.when(F.col("event_type") == "error", "d").otherwise("u")
    )
    merged = merge_upsert(
        snap,
        changes,
        keys=["user_id"],
        ordering=["ts", "event_id"],
        op_col="op",
    )
    return merged.select(
        "user_id", "event_id", "event_type", dround("value", 2).alias("value")
    )


@_q(
    "cdc_envelope_roundtrip",
    """
    SELECT CAST(json_extract_string(v, '$.payload.after.event_id') AS BIGINT) AS event_id,
           json_extract_string(v, '$.payload.op')                             AS op,
           json_extract_string(v, '$.payload.after.event_type')               AS event_type,
           CAST(json_extract_string(v, '$.payload.source.lsn') AS BIGINT)     AS lsn
    FROM (SELECT json_object('payload', json_object(
                   'after', json_object('event_id', event_id, 'event_type', event_type),
                   'source', json_object('lsn', event_id * 10),
                   'op', 'c')) AS v
          FROM events WHERE event_id <= 1000)
    """,
)
def cdc_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope build + parse (reference A6/A7, README.md:182-184): serialize
    rows into Debezium-shaped JSON, then from_json against a *declared*
    schema (the SURVEY.md §7.4.1 fix — no per-batch inference) and project
    nested payload fields."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 1000)
    enveloped = ev.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.struct("event_id", "event_type").alias("after"),
                    F.struct((F.col("event_id") * 10).alias("lsn")).alias("source"),
                    F.lit("c").alias("op"),
                ).alias("payload")
            )
        ).alias("v")
    )
    schema = (
        "struct<payload:struct<after:struct<event_id:bigint,event_type:string>,"
        "source:struct<lsn:bigint>,op:string>>"
    )
    parsed = enveloped.withColumn("json", F.from_json("v", schema))
    return parsed.select(
        F.col("json.payload.after.event_id").alias("event_id"),
        F.col("json.payload.op").alias("op"),
        F.col("json.payload.after.event_type").alias("event_type"),
        F.col("json.payload.source.lsn").alias("lsn"),
    ).drop("json", "v")


@_q(
    "cdc_asof_join",
    """
    SELECT p.event_id, p.user_id,
           s.event_id AS signup_event_id,
           CASE WHEN s.event_id IS NULL THEN -1
                ELSE date_diff('second', s.ts, p.ts) END AS secs_since_signup
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def cdc_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward inclusive): each purchase matched to the user's
    most recent signup at-or-before it. Union+window composition
    (operators/asof.py) — one shuffle, no range explosion."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts"), F.col("event_id").alias("s_event_id")
    )
    joined = asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="s_ts",
        right_values=["s_event_id", "s_ts"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("s_event_id").alias("signup_event_id"),
        F.when(F.col("s_event_id").isNull(), F.lit(-1))
        .otherwise(
            F.col("ts").cast("long") - F.col("s_ts").cast("long")
        )
        .alias("secs_since_signup"),
    )


@_q(
    "cdc_topic_to_table",
    """
    SELECT split_part(topic, '.', 3) AS table_name, count(*) AS n
    FROM (SELECT concat('debezium1.public.', event_type) AS topic FROM events)
    GROUP BY 1
    """,
)
def cdc_topic_to_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic → table-name derivation (reference B14: topic namespace
    ``debezium1.public.employees``, README.md:104)."""
    from ..envelope import topic_to_table

    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("debezium1.public."), F.col("event_type")).alias("topic")
    )
    return ev.select(topic_to_table().alias("table_name")).groupBy("table_name").agg(
        F.count(F.lit(1)).alias("n")
    )


@_q(
    "cdc_incremental_read",
    """
    SELECT event_type, count(*) AS n, min(event_id) AS min_id,
           max(event_id) AS max_id
    FROM events
    WHERE event_id <= 3000 AND event_id % 3 <> 0
    GROUP BY event_type
    """,
)
def cdc_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental pull (Hudi incremental-query mode, the DeltaStreamer
    consumer contract): three scripted micro-batches land in the append
    log's ``ingest_batch=<id>`` directories; the consumer then reads only
    batches AFTER its checkpoint (batch 0) via
    streaming.pipeline.incremental_read — directory-level pruning, cost
    proportional to new commits. The oracle recomputes the same batch
    membership (event_id % 3) directly; min/max ids pin that batch-0 rows
    never leak into the incremental result."""
    import tempfile

    from ..streaming.pipeline import incremental_read

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 3000)
    out = tempfile.mkdtemp(prefix="spark_graft_incr_")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).write.mode("overwrite").parquet(
            f"{out}/ingest_batch={i}"
        )
    inc = incremental_read(spark, out, since_batch=0)
    return inc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


def _ts_terciles(ev, col: str = "ts") -> list[tuple]:
    """Three equal time windows spanning ALL of `ev[col]` — derived from
    the data's own min/max, not fixture-era constants, so batch replays
    cover every row at every scale factor (the sf1 fixture extends event
    time 10×; hard-coded 2024 windows silently dropped nine tenths of
    it). The final latest-wins state is boundary-independent; only full
    coverage matters. The single home of this boundary arithmetic — the
    join-view replay reuses it on o_orderdate."""
    import datetime as _dt

    b = ev.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = b.lo, b.hi + _dt.timedelta(seconds=1)
    step = (hi - lo) / 3
    return [(lo + i * step, lo + (i + 1) * step if i < 2 else hi) for i in range(3)]


@_q(
    "table_compact_roundtrip",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def table_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table maintenance end-to-end (Hudi's clustering/compaction service,
    SURVEY §2.B): three TIME-ORDERED change batches upsert into a
    KeyedTable — accreting one file set per batch, the streaming-table
    small-file decay — then ``compact`` rewrites the table at a target
    file count. The graded property is that maintenance is semantically
    invisible: the compacted table still equals the global latest-row-per-
    key state the oracle computes. Batches are split into data-derived
    time terciles so cross-batch precedence (changes outrank snapshot, B9)
    coincides with the oracle's ts ordering."""
    import tempfile

    from ..table import KeyedTable

    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        # Ordering rides the CDC metadata columns (_ts_ms/_lsn are stripped
        # from the stored rows by design) so ts/event_id stay data columns.
        .withColumn("_ts_ms", F.unix_micros("ts"))
        .withColumn("_lsn", F.col("event_id"))
    )
    t = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="spark_graft_compact_"),
        keys=["user_id"],
        ordering=["_ts_ms", "_lsn"],
        op_col=None,
    )
    for lo, hi in _ts_terciles(ev):
        batch = ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        t.upsert(batch)
    t.compact(target_partitions=2)
    return t.read().select("user_id", "event_id", "event_type")


@_q(
    "cdc_time_travel",
    f"""
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts < TIMESTAMP '2024-01-21 00:00:00') WHERE rn = 1
    """,
)
def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel (Hudi commit timeline, opt-in ``keep_history``): three
    time-ordered change batches commit an immutable snapshot each;
    ``read(as_of=1)`` returns the table exactly as of the SECOND commit —
    i.e. the latest-row-per-key state over the first two batches, which
    is what the oracle computes directly (events before Jan 21). The
    third batch's changes must be invisible, which pins both snapshot
    isolation and retention (keep_history=3 holds all three commits)."""
    import tempfile

    from ..table import KeyedTable

    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .withColumn("_ts_ms", F.unix_micros("ts"))
        .withColumn("_lsn", F.col("event_id"))
    )
    t = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="spark_graft_tt_"),
        keys=["user_id"],
        ordering=["_ts_ms", "_lsn"],
        op_col=None,
        keep_history=3,
    )
    for lo, hi in (("2024-01-01", "2024-01-11"), ("2024-01-11", "2024-01-21"), ("2024-01-21", "2024-02-01")):
        t.upsert(ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi)))
    return t.read(as_of=1).select("user_id", "event_id", "event_type")


@_q(
    "cdc_mor_table",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def cdc_mor_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE_ON_READ table type (the Hudi table-type axis the reference's
    COPY_ON_WRITE config leaves unexplored): three time-ordered change
    batches land as O(batch) delta-log appends — no table rewrite — and
    the snapshot is the latest-wins merge computed at read time with
    (batch id, ordering) precedence. Same oracle as the COW queries: the
    table type must be invisible in the result, only the write/read cost
    profile differs."""
    import tempfile

    from ..table import DeltaLogTable

    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .withColumn("_ts_ms", F.unix_micros("ts"))
        .withColumn("_lsn", F.col("event_id"))
    )
    t = DeltaLogTable(
        spark,
        tempfile.mkdtemp(prefix="spark_graft_mor_"),
        keys=["user_id"],
        ordering=["_ts_ms", "_lsn"],
        op_col=None,
    )
    for i, (lo, hi) in enumerate(_ts_terciles(ev)):
        t.append_changes(
            ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))), i
        )
    return t.read().select("user_id", "event_id", "event_type")


@_q(
    "cdc_mor_time_travel",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts < TIMESTAMP '2024-01-21 00:00:00') WHERE rn = 1
    """,
)
def cdc_mor_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on the MERGE_ON_READ axis (COW sibling:
    cdc_time_travel): two change batches each followed by a compaction
    publish an MVCC base version apiece; ``read_version`` on the FIRST
    version returns the table exactly as of the first compaction — the
    latest-row-per-key state over the pre-Jan-21 events, which the oracle
    computes directly. The second batch's changes must be invisible,
    pinning that compaction versions are immutable snapshots (retention
    keeps the two newest, so both are still servable)."""
    import tempfile

    from ..table import DeltaLogTable

    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .withColumn("_ts_ms", F.unix_micros("ts"))
        .withColumn("_lsn", F.col("event_id"))
    )
    t = DeltaLogTable(
        spark,
        tempfile.mkdtemp(prefix="spark_graft_mor_tt_"),
        keys=["user_id"],
        ordering=["_ts_ms", "_lsn"],
        op_col=None,
    )
    cut = F.lit("2024-01-21").cast("timestamp")
    t.append_changes(ev.filter(F.col("ts") < cut), 0)
    t.compact()
    t.append_changes(ev.filter(F.col("ts") >= cut), 1)
    t.compact()
    first = t.base_versions()[0]
    return t.read_version(first).select("user_id", "event_id", "event_type")


@_q(
    "cdc_avro_roundtrip",
    """
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'd' ELSE 'c' END AS op,
           event_type,
           event_id * 10 AS lsn
    FROM events WHERE event_id <= 1000
    """,
)
def cdc_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Avro binary serde round-trip under the correctness gate
    (reference B4, README.md:262-263): flat change rows are encoded to
    Avro-binary envelope records by the engine's pure-Python writer
    (envelope.encode_envelope_avro_py, mapInPandas) and decoded back by
    its reader (parse_envelope_avro_py) — deletes travel as before-images
    and must come back intact. The oracle sees only the original rows:
    a hash match proves encode∘decode is the identity on the wire format.

    Scale note: both sides are the documented Python slow lane; with
    spark-avro present the same contract runs JVM-side via
    to_avro/from_avro (envelope.parse_envelope_avro). The graded query
    pins the SEMANTICS so either lane must reproduce it."""
    from pyspark.sql import types as T

    from ..envelope import encode_envelope_avro_py, parse_envelope_avro_py

    row_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    flat = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") <= 1000)
        .select(
            F.when(F.col("event_type") == "error", "d").otherwise("c").alias("op"),
            (F.col("event_id") * 10).alias("_lsn"),
            F.col("event_id").cast("long").alias("_ts_ms"),
            "event_id",
            "event_type",
        )
    )
    wire = encode_envelope_avro_py(flat, row_schema=row_schema, table="events")
    decoded = parse_envelope_avro_py(wire, row_schema=row_schema)
    return decoded.select(
        "event_id", "op", "event_type", F.col("_lsn").alias("lsn")
    )


@_q(
    "cdc_schema_evolution",
    """
    WITH snap AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_custkey <= 200),
    chg AS (
      SELECT c_custkey, round(c_acctbal + 50.0, 2) AS c_acctbal,
             CASE WHEN c_acctbal >= 5000 THEN 'gold' ELSE 'std' END AS c_tier
      FROM customer WHERE c_custkey <= 200 AND c_custkey % 2 = 0)
    SELECT s.c_custkey,
           CASE WHEN c.c_custkey IS NULL THEN s.c_name END AS c_name,
           coalesce(c.c_acctbal, s.c_acctbal) AS c_acctbal,
           c.c_tier
    FROM snap s LEFT JOIN chg c USING (c_custkey)
    """,
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way schema reconciliation UNDER THE ORACLE GATE (reference B11,
    Hudi `reconcile.schema` — previously pinned only in pytest): the
    change batch both DROPS a snapshot column (c_name) and ADDS a new
    one (c_tier), and the oracle encodes the reconciliation contract
    exactly:

    - added column: c_tier joins the table schema, valued for updated
      rows, NULL for untouched rows;
    - dropped column: an UPDATED row's c_name becomes NULL — the batch
      row is authoritative for the whole row (a Debezium after-image
      carries every column; one that omits a column writes NULL rather
      than resurrecting stale values), while untouched rows keep their
      snapshot c_name."""
    cust = _t(spark, sf_dir, "customer")
    snap = cust.filter(F.col("c_custkey") <= 200).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    changes = (
        cust.filter((F.col("c_custkey") <= 200) & (F.col("c_custkey") % 2 == 0))
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") + 50.0, 2).alias("c_acctbal"),
            F.when(F.col("c_acctbal") >= 5000, "gold").otherwise("std").alias(
                "c_tier"
            ),
            F.lit("u").alias("op"),
            F.lit(2).alias("_lsn"),
        )
    )
    merged = merge_upsert(snap, changes, keys=["c_custkey"], ordering=["_lsn"])
    return merged.select("c_custkey", "c_name", "c_acctbal", "c_tier")


@_q(
    "cdc_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    chg AS (
      SELECT user_id, ts, event_id, event_type FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type),
    scd AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM chg)
    SELECT user_id, event_type, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM scd
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built FROM the change stream — the
    canonical CDC-to-warehouse materialization the reference's pipeline
    feeds: per key, (1) suppress no-op changes (an update that does not
    alter the tracked attribute opens no new version — lag change-detect),
    then (2) assign each surviving version its validity interval
    [valid_from, valid_to) via lead, with the open interval flagged
    ``is_current``. Every historical point-in-time query (the as-of join
    family) can then be answered with a BETWEEN on one table.

    Scale: both windows and the filter share the user_id partitioning, so
    Catalyst plans ONE exchange on the key reused across lag, filter, and
    lead (same exchange-reuse shape as pipe_sessionize); (ts, event_id)
    gives the windows a total order, making version boundaries
    deterministic under replay. At 100 TB this is the incremental
    pattern's batch form — the streaming form folds new changes against
    only each key's current open row."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    return chg.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@_q(
    "cdc_incremental_join_view",
    """
    WITH dim AS (
      SELECT c_custkey, c_name, c_mktsegment,
             CASE WHEN c_mktsegment = 'BUILDING'
                  THEN c_acctbal + 1000 ELSE c_acctbal END AS bal
      FROM customer)
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment,
           round(o_totalprice, 2) AS totalprice,
           round(bal, 2) AS acctbal
    FROM orders JOIN dim ON o_custkey = c_custkey
    WHERE o_orderstatus <> 'F'
    """,
)
def cdc_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance of a fact⋈dim join
    (streaming/ivm.py — the denormalized serving table the reference's
    landed CDC tables exist to feed): orders stream in as three
    time-ordered insert batches plus a delete batch (every 'F'-status
    order retracted), customers land once and then receive a segment-wide
    balance update — five CDC batches total, each refreshing ONLY the
    affected view keys. The final view must equal the one-shot join of
    final fact state with final dim state, which is exactly what the
    oracle computes.

    What each batch exercises: fact inserts (view grows by the batch's
    keys), fact deletes (view rows retract via the gone-key path), and a
    dim update whose propagation set — every order of every BUILDING
    customer — is found with one broadcast semi-join of the stored fact,
    never a full re-join. Scale: per-batch cost is O(Δ + affected rows);
    with the fact/view partitioned by an FK bucket the COW rewrite
    directory-prunes like every KeyedTable."""
    import tempfile

    from ..streaming.ivm import IncrementalJoinView

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    v = IncrementalJoinView(
        spark,
        tempfile.mkdtemp(prefix="spark_graft_ivm_"),
        fact_keys=["o_orderkey"],
        fk="o_custkey",
        dim_key="c_custkey",
        how="inner",
    )
    v.apply_dim_batch(
        cust.withColumn("op", F.lit("u")).withColumn("_lsn", F.lit(1))
    )
    for w_lo, w_hi in _ts_terciles(orders, col="o_orderdate"):
        batch = (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(w_lo))
                & (F.col("o_orderdate") < F.lit(w_hi))
            )
            .withColumn("op", F.lit("u"))
            .withColumn("_lsn", F.col("o_orderkey"))
        )
        v.apply_fact_batch(batch)
    retract = (
        orders.filter(F.col("o_orderstatus") == "F")
        .withColumn("op", F.lit("d"))
        .withColumn("_lsn", F.col("o_orderkey") + F.lit(10_000_000))
    )
    v.apply_fact_batch(retract)
    upd = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
        .withColumn("op", F.lit("u"))
        .withColumn("_lsn", F.lit(2))
    )
    v.apply_dim_batch(upd)
    return v.read().select(
        "o_orderkey",
        "o_custkey",
        "c_name",
        "c_mktsegment",
        dround("o_totalprice", 2).alias("totalprice"),
        dround("c_acctbal", 2).alias("acctbal"),
    )


@_q(
    "cdc_catalog_sync",
    """
    WITH snap AS (
      SELECT user_id, event_id, event_type
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) rn
            FROM events)
      WHERE rn = 1)
    SELECT event_type, count(*) AS n_users,
           min(user_id) AS min_user, max(event_id) AS max_event
    FROM snap GROUP BY event_type
    """,
)
def cdc_catalog_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog sync graded end-to-end (reference B12, the hive_sync /
    Glue-registration intent of README.md:298-304): the upserted
    KeyedTable is REGISTERED under a name and then consumed purely
    through ``spark.sql`` over that name — the path a BI tool or another
    team's job takes. The oracle computes the same per-type summary from
    the raw events, so a registration that serves a stale or partial
    snapshot fails the hash. Locally ``register`` is a temp view; on a
    cluster the same call site is ``saveAsTable`` against the
    metastore."""
    import tempfile
    import uuid as _uuid

    from ..table import KeyedTable

    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .withColumn("_ts_ms", F.unix_micros("ts"))
        .withColumn("_lsn", F.col("event_id"))
    )
    t = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="spark_graft_cat_"),
        keys=["user_id"],
        ordering=["_ts_ms", "_lsn"],
        op_col=None,
    )
    t.upsert(ev)
    name = f"synced_{_uuid.uuid4().hex[:8]}"
    t.register(name)
    return spark.sql(
        f"""
        SELECT event_type, count(*) AS n_users,
               min(user_id) AS min_user, max(event_id) AS max_event
        FROM {name} GROUP BY event_type
        """
    )


@_q(
    "cdc_hot_keys",
    """
    WITH per_key AS (
      SELECT user_id,
             count(*) AS n_changes,
             count(DISTINCT event_type) AS n_types,
             CAST(min(ts) AS DATE) AS first_day,
             CAST(max(ts) AS DATE) AS last_day
      FROM events GROUP BY user_id),
    tot AS (SELECT avg(n_changes) AS mean_changes FROM per_key)
    SELECT user_id, n_changes, n_types, first_day, last_day,
           CASE WHEN n_changes >= 2 * mean_changes THEN 'hot'
                WHEN n_changes >= mean_changes     THEN 'warm'
                ELSE 'cold' END AS churn_class
    FROM per_key, tot
    """,
)
def cdc_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key audit for an upserted CDC table — the write-skew
    diagnostic an operator runs when a COW table's rewrite cost spikes
    (one hot key forces its whole partition to rewrite every batch; the
    reference's single-`employees`-table pipeline concentrates all churn
    on a handful of ids by construction). Per key: change count, distinct
    operation types, first/last change DAY (dates, not raw timestamps —
    driver hash contract), and a churn class relative to the mean change
    rate. Feeds the MOR-vs-COW table-type decision and salting/bucketing
    choices (operators/skew.py) directly.

    Scale: one key-grain aggregate (map-side partials; the count-distinct
    is per-key, not global) plus a 1-row mean broadcast-joined back — the
    crossJoin is the repo's established broadcast-scalar pattern, never a
    shuffle. The mean comparison is exact: both engines average the same
    integral counts over the same key set."""
    ev = _t(spark, sf_dir, "events")
    # Materialized once: the aggregate feeds BOTH the output rows and the
    # broadcast mean — lazy, the fact scan + key-grain shuffle would run
    # twice (verified in the plan; same single-fact-scan fix as
    # tpch_q15_top_supplier, pinned in test_plans).
    per_key = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").cast("date").alias("first_day"),
        F.max("ts").cast("date").alias("last_day"),
    ).localCheckpoint(eager=True)
    mean = per_key.agg(F.avg("n_changes").alias("mean_changes"))
    return per_key.crossJoin(F.broadcast(mean)).select(
        "user_id",
        "n_changes",
        "n_types",
        "first_day",
        "last_day",
        F.when(F.col("n_changes") >= 2 * F.col("mean_changes"), "hot")
        .when(F.col("n_changes") >= F.col("mean_changes"), "warm")
        .otherwise("cold")
        .alias("churn_class"),
    )
