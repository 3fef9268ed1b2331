"""Training-data-pipeline queries beyond the core LLM ops (queries/llm.py):
deterministic corpus sharding, sessionization, TF-IDF, chunking, PII
scrubbing. Every query here is SQL-expressible, so each carries a DuckDB
oracle.

Scale notes are per-query; the common theme is that every operator is a
single shuffle-bounded groupBy/window over JVM-side expressions — no UDFs,
no driver loops, no all-pairs joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table as _t
from ..functions import dround

from ._registry import make_registry

QUERIES, ORACLES, _q = make_registry()


# Knuth's multiplicative constant: cheap, engine-agnostic integer mixing.
# xxhash64/md5 would be Spark-only; training pipelines need the SPLIT to be
# recomputable by any engine reading the same table, which is exactly the
# portability the oracle proves.
_MIX = 2654435761


@_q(
    "pipe_hash_split",
    f"""
    WITH b AS (
      SELECT *, (doc_id * {_MIX}) % 1000 AS bucket FROM documents)
    SELECT CASE WHEN bucket < 800 THEN 'train'
                WHEN bucket < 900 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc_id
    FROM b GROUP BY 1
    """,
)
def pipe_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test sharding (80/10/10) by multiplicative
    hash of the stable key — the standard leakage-proof corpus split: no
    RNG state, no sampling seed to ship, any engine re-derives membership
    from the key alone. One map-side projection + one groupBy(3 groups):
    at 100 TB this is a pure scan with a tiny final combine; the same
    bucket expression also serves as a WHERE-clause membership filter
    (predicate-pushdown friendly) when materializing one split."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_MIX)) % 1000
    split = (
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@_q(
    "pipe_sessionize",
    """
    WITH d AS (
      SELECT user_id, ts, value, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    s AS (
      SELECT user_id, ts, value,
             sum(CASE WHEN prev IS NULL OR ts > prev + INTERVAL 1 DAY
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM d)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start,
           CAST(epoch_us(max(ts)) AS BIGINT) AS session_end,
           round(sum(CAST(round(value * 1000, 0) AS BIGINT)) / 1000.0, 3)
             AS session_value
    FROM s GROUP BY user_id, session_id
    """,
)
def pipe_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap > 1 day splits a session): lag to find
    gaps, running sum of gap flags to number sessions, then per-session
    aggregates — two window passes over ONE shuffle (both windows and the
    final groupBy share the user_id partitioning, so Catalyst reuses the
    exchange). The streaming sibling is stream_session_windows; this is
    the backfill path a 100 TB event archive needs. Event ordering is
    (ts, event_id) — the unique tiebreak keeps lag deterministic; value
    sums go through the ×1000 integer trick (3dp-quantized input) so the
    result is partition-order independent."""
    ev = _t(spark, sf_dir, "events")
    by_ts = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.col("prev").isNull()
        | (F.col("ts") > F.col("prev") + F.expr("INTERVAL 1 DAY")),
        1,
    ).otherwise(0)
    sess = (
        ev.withColumn("prev", F.lag("ts").over(by_ts))
        .withColumn(
            "session_id",
            # Same total order (ts, event_id) as the lag window: with
            # duplicate (user_id, ts) rows a ts-only ordering would place
            # tied rows on either side of a gap flag nondeterministically.
            F.sum(gap).over(
                by_ts.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )
    vint = dround(F.col("value") * 1000, 0).cast("long")
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # Epoch micros, not raw TIMESTAMP: collect() renders timestamps in
        # the DRIVER OS timezone (review-confirmed parity failure under a
        # non-UTC TZ) — the surface rule is dates/epoch ints only.
        F.unix_micros(F.min("ts")).alias("session_start"),
        F.unix_micros(F.max("ts")).alias("session_end"),
        dround(F.sum(vint) / 1000.0, 3).alias("session_value"),
    )


@_q(
    "pipe_tfidf_top_terms",
    """
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY doc_id, term),
    stats AS (
      SELECT term, sum(tf) AS total_tf, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term, df,
           round(ln((n_docs + 1.0) / (df + 1.0)) * total_tf / df, 4)
             AS avg_tfidf
    FROM stats, n
    ORDER BY avg_tfidf DESC, term
    LIMIT 20
    """,
)
def pipe_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF: term frequency per doc, document frequency across
    the corpus, smoothed idf = ln((N+1)/(df+1)), ranked by the average
    per-containing-doc score. Shape at 100 TB: explode + two hash
    aggregations (map-side partials on both) + a broadcast of the single
    corpus-count row + global top-K (TakeOrderedAndProject — no full
    sort). The average is computed as idf·Σtf/df with the Σtf exact in
    integers, so no floating partial-sum order sensitivity."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.sum("tf").alias("total_tf"), F.count(F.lit(1)).alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = stats.join(F.broadcast(n)).select(
        "term",
        "df",
        dround(
            F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            * F.col("total_tf")
            / F.col("df"),
            4,
        ).alias("avg_tfidf"),
    )
    return scored.orderBy(F.col("avg_tfidf").desc(), "term").limit(20)


@_q(
    "pipe_chunk_documents",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    starts AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 15)) AS s FROM t)
    SELECT doc_id, (s / 15)::BIGINT AS chunk_id,
           len(toks[s + 1 : s + 20]) AS n_tokens,
           toks[s + 1] AS first_tok,
           toks[least(s + 20, len(toks))] AS last_tok
    FROM starts
    """,
)
def pipe_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for context-window packing: fixed 20-token chunks
    with stride 15 (5-token overlap). Pure generator shape — split,
    sequence of chunk starts, posexplode, slice — rows multiply but bytes
    stay bounded by the overlap factor; no shuffle at all until a
    downstream consumer aggregates (the explode is pipelined into the
    scan). Per-chunk token counts/boundary tokens come out as scalars so
    the oracle compares cell-for-cell."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    n = F.size("toks")
    starts = docs.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(0), n - 1, F.lit(15))).alias("chunk_id", "s"),
    )
    chunk = F.slice("toks", F.col("s") + 1, 20)
    return starts.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.element_at("toks", F.col("s") + 1).alias("first_tok"),
        F.element_at("toks", F.least(F.col("s") + 20, n)).alias("last_tok"),
    )


@_q(
    "pipe_pii_scrub",
    """
    WITH aug AS (
      SELECT doc_id, source,
             text || ' contact user' || doc_id ||
             '@example.com or +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
               AS text
      FROM documents),
    scrubbed AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+'))
               AS n_emails,
             regexp_replace(
               regexp_replace(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
               '\\+[0-9][0-9-]{6,}', '<PHONE>', 'g') AS clean
      FROM aug)
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_emails) AS BIGINT) AS emails_redacted,
           CAST(sum(CASE WHEN clean LIKE '%<PHONE>%' THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_with_phone,
           CAST(sum(len(clean)) AS BIGINT) AS total_clean_chars
    FROM scrubbed GROUP BY source
    """,
)
def pipe_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails + phone numbers → placeholder tokens) over a
    deterministically PII-augmented corpus — the fixtures carry no PII, so
    the query injects a synthetic email/phone per doc first, which makes
    redaction coverage exactly checkable (one email per doc must be
    caught). regexp_replace/regexp_count are JVM-side codegen expressions;
    at 100 TB this is a pure map stage feeding a small per-source
    combine. Patterns stay in the RE2-compatible subset so any engine
    applies the same policy."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    email = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
    phone = r"\+[0-9][0-9-]{6,}"
    scrubbed = aug.select(
        "source",
        F.regexp_count("text", F.lit(email)).alias("n_emails"),
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("clean"),
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").alias("emails_redacted"),
        F.sum(
            F.when(F.col("clean").contains("<PHONE>"), 1).otherwise(0)
        ).alias("docs_with_phone"),
        F.sum(F.length("clean")).alias("total_clean_chars"),
    )


@_q(
    "pipe_pack_sharded",
    f"""
    WITH t AS (
      SELECT doc_id, (doc_id * {_MIX}) % 8 AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT shard, CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY shard, pack_id
    """,
)
def pipe_pack_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, production form: shard by multiplicative hash
    FIRST (8 shards here; thousands at 100 TB), then run the
    first-fit-in-order running-sum pack within each shard — the window
    partitions by shard, so packing parallelizes instead of serializing on
    one global sort (llm_pack_sequences documents that cliff). Same
    deterministic membership story as pipe_hash_split: the shard and pack
    of a doc are pure functions of its id and the ordered token counts."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") * F.lit(_MIX)) % 8).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = docs.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.withColumn(
            "pack_id", ((F.col("cum") - F.col("n_tokens")) / 512).cast("long")
        )
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@_q(
    "pipe_profile_columns",
    """
    SELECT 'doc_id' AS col, count(*) AS n,
           count(*) - count(doc_id) AS n_null,
           count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_repr,
           CAST(max(doc_id) AS VARCHAR) AS max_repr
    FROM documents
    UNION ALL
    SELECT 'lang', count(*), count(*) - count(lang),
           count(DISTINCT lang),
           CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', count(*), count(*) - count(source),
           count(DISTINCT source),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*), count(*) - count(n_chars),
           count(DISTINCT n_chars),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def pipe_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-quality gate before any pipeline run):
    per-column row count, null count, exact distinct, min/max — emitted as
    one tidy (col, stat...) table, computed in ONE aggregate over ONE scan
    (round-4 review fix: the previous union-of-aggregates form planned
    four independent scans while its docstring claimed one) and unpivoted
    with ``stack``. At 100 TB swap exact distinct for
    approx_count_distinct (agg_approx_distinct grades that path)."""
    docs = _t(spark, sf_dir, "documents")
    cols = ("doc_id", "lang", "source", "n_chars")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"min_{c}"),
            F.max(c).cast("string").alias(f"max_{c}"),
        ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n, null_{c}, nd_{c}, min_{c}, max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col, n, n_null, n_distinct, min_repr, max_repr)"
        )
    )


@_q(
    "pipe_funnel_conversion",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    conv AS (
      SELECT s.user_id, s.signup_ts, min(e.ts) AS first_purchase_ts
      FROM s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
           AND e.ts >= s.signup_ts
           AND e.ts < s.signup_ts + INTERVAL 7 DAY
      GROUP BY s.user_id, s.signup_ts)
    SELECT count(*) AS n_signup_users,
           count(first_purchase_ts) AS n_converted,
           round(count(first_purchase_ts)::DOUBLE / count(*), 4)
             AS conversion_rate,
           round(avg(date_diff('second', signup_ts, first_purchase_ts))
                 / 3600.0, 3) AS avg_hours_to_convert
    FROM conv
    """,
)
def pipe_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel (signup → purchase within 7 days): first signup
    per user, earliest qualifying purchase inside the window, corpus
    conversion rate and mean time-to-convert.

    Scale: the signup aggregate shrinks the left side to one row per
    user before the range-joined purchase probe; the range join is an
    equi-join on user_id with the time window as a residual predicate —
    one shuffle on user_id, never a time-cross-product. The final
    aggregate is a single global row (partial-agg'd)."""
    ev = _t(spark, sf_dir, "events")
    # Both sides derive from the same scan — explicit aliases make the join
    # key resolution unambiguous (the bare s.user_id == p.user_id form
    # resolves to one attribute id and leans on Spark's self-join
    # disambiguation heuristic, which warns and can silently flip to a
    # trivially-true predicate under refactoring).
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
        .alias("s")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .alias("p")
    )
    conv = (
        s.join(
            p,
            (F.col("s.user_id") == F.col("p.user_id"))
            & (F.col("p_ts") >= F.col("signup_ts"))
            & (F.col("p_ts") < F.col("signup_ts") + F.expr("INTERVAL 7 DAY")),
            "left",
        )
        .groupBy(F.col("s.user_id"), F.col("signup_ts"))
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("first_purchase_ts").alias("n_converted"),
        dround(
            F.count("first_purchase_ts").cast("double") / F.count(F.lit(1)), 4
        ).alias("conversion_rate"),
        dround(
            F.avg(
                F.col("first_purchase_ts").cast("long")
                - F.col("signup_ts").cast("long")
            )
            / 3600.0,
            3,
        ).alias("avg_hours_to_convert"),
    )


@_q(
    "pipe_cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, min(time_bucket(INTERVAL 1 WEEK, ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, time_bucket(INTERVAL 1 WEEK, ts) AS act_week
      FROM events)
    SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
           date_diff('week', f.cohort_week, a.act_week) AS week_offset,
           count(*) AS n_active
    FROM first_seen f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def pipe_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    counted in every later week they were active — the standard
    engagement triangle.

    Scale: both inputs collapse to (user, week) grain before the join
    (distinct + min are partial-agg'd, shuffle is user-sized not
    event-sized); the cohort join is an equi-join on user_id. The output
    is |weeks|² rows — chart-sized."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", "ts").alias("week"),
    )
    first_seen = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = ev.distinct().withColumnRenamed("week", "act_week")
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                (
                    F.col("act_week").cast("long")
                    - F.col("cohort_week").cast("long")
                )
                / (7 * 86400)
            ).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        # DATE, not raw TIMESTAMP (driver-OS-timezone hazard — see
        # pipe_sessionize); the week bucket is midnight-aligned so the
        # cast loses nothing.
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            "week_offset",
            "n_active",
        )
    )


@_q(
    "pipe_epoch_shuffle",
    """
    WITH s AS (
      SELECT doc_id, doc_id % 8 AS shard,
             md5(concat_ws(':', 'epoch1', doc_id)) AS k
      FROM documents)
    SELECT shard, doc_id,
           row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
    FROM s
    """,
)
def pipe_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle — the training-data ORDERING step: each
    epoch's read order is a pseudorandom permutation derived from
    md5(epoch_seed, doc_id), so the order is (a) uncorrelated with ingest
    order (the point of shuffling), (b) different per epoch (change the
    seed string), and (c) reproducible by any engine without shipping RNG
    state — a training run can be resumed or audited from the key alone.

    Scale: the permutation is SHARDED — position is assigned within each
    of the 8 hash shards (PARTITION BY shard), never by one global sort:
    at 100 TB a global row_number is one task, while per-shard ordering is
    embarrassingly parallel and each shard's output IS the read order for
    one data-loader worker (matching how training jobs actually consume
    shards). One hash shuffle on shard, sort within."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.md5(F.concat_ws(":", F.lit("epoch1"), F.col("doc_id"))).alias("k"),
    )
    w = W.partitionBy("shard").orderBy("k", "doc_id")
    return s.select(
        "shard", "doc_id", F.row_number().over(w).alias("pos")
    )


@_q("pipe_ingest_neardup_gate")  # MinHash LSH — rows-only; recall pinned in tests/
def pipe_ingest_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup ADMISSION CONTROL for incremental ingest — the steady-state
    sibling of pipe_incremental_dedup (which gates on exact digests): an
    incoming batch (source='src1') is probed against the existing corpus's
    MinHash signature index via cross-set LSH banding; a batch doc whose
    best candidate signature agreement is ≥ 0.5 is rejected as a near-dup
    of the corpus. Reports per-language admission counts plus the worst
    offender's estimated Jaccard.

    Scale: the corpus side of minhash_lsh_candidates_between is the
    persisted signature index (bands longs per doc, built once, maintained
    per ingest like llm_index_maintain's gram index); each batch rebuilds
    only its OWN signatures and the join is bucket-intersection sized —
    never batch×corpus. No oracle: MinHash isn't SQL-expressible; the
    recall/containment contract vs exact batch×corpus Jaccard is pinned in
    tests/test_operators.py."""
    from ..operators.dedup import (
        minhash_lsh_candidates_between,
        minhash_signatures_from_tokens,
    )
    from ..operators.text import tokens_col

    docs = _t(spark, sf_dir, "documents").withColumn("tokens", tokens_col())
    batch = docs.filter(F.col("source") == "src1")
    corpus = docs.filter(F.col("source") != "src1")
    cands = minhash_lsh_candidates_between(
        minhash_signatures_from_tokens(batch, "doc_id"),
        minhash_signatures_from_tokens(corpus, "doc_id"),
        "doc_id",
    )
    worst = cands.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.max("est_jaccard").alias("best_match")
    )
    gated = batch.join(F.broadcast(worst), "doc_id", "left_outer").withColumn(
        "rejected", F.coalesce(F.col("best_match"), F.lit(0.0)) >= 0.5
    )
    return gated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.count_if(F.col("rejected")).alias("n_rejected"),
        F.count_if(~F.col("rejected")).alias("n_admitted"),
        dround(F.max(F.when(F.col("rejected"), F.col("best_match"))), 4).alias(
            "worst_est_jaccard"
        ),
    )


@_q(
    "pipe_ingest_neardup_gate_exact",
    """
    WITH sh AS (
      SELECT doc_id, source, lang,
             list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
      FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 3),
    binv AS (SELECT doc_id, len(shingles) AS n_a, unnest(shingles) AS sh
             FROM sh WHERE source = 'src1'),
    cinv AS (SELECT doc_id, len(shingles) AS n_b, unnest(shingles) AS sh
             FROM sh WHERE source <> 'src1'),
    pairs AS (
      SELECT b.doc_id AS id_a, b.n_a, c.n_b, count(*) AS shared
      FROM binv b JOIN cinv c ON b.sh = c.sh
      GROUP BY b.doc_id, c.doc_id, b.n_a, c.n_b),
    worst AS (
      SELECT id_a AS doc_id,
             max(shared::DOUBLE / (n_a + n_b - shared)) AS best_match
      FROM pairs GROUP BY id_a),
    gated AS (
      SELECT d.lang, w.best_match,
             coalesce(w.best_match, 0.0) >= 0.5 AS rejected
      FROM documents d LEFT JOIN worst w ON d.doc_id = w.doc_id
      WHERE d.source = 'src1')
    SELECT lang,
           count(*) AS n_batch,
           count(*) FILTER (rejected) AS n_rejected,
           count(*) FILTER (NOT rejected) AS n_admitted,
           round(max(CASE WHEN rejected THEN best_match END), 4) AS worst_jaccard
    FROM gated GROUP BY lang
    """,
)
def pipe_ingest_neardup_gate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable companion of pipe_ingest_neardup_gate (the
    `_exact`-sibling pattern, cf. llm_dedup_clusters_exact): the same
    admission-control report computed from EXACT cross-set trigram-shingle
    Jaccard — incoming batch (source='src1') vs corpus, never
    batch×corpus. Batch docs too short to shingle (<3 tokens) can't match
    anything and are admitted by the left join, so n_batch still counts
    them.

    Exactness under candidate pruning: the report only surfaces Jaccard
    THROUGH the 0.5 threshold (`rejected` and the rejected-only
    worst_jaccard max), so a below-threshold match is invisible — which
    makes the AllPairs/PPJoin PREFIX FILTER (Bayardo et al., WWW'07)
    exact here, not approximate: J(A,B) ≥ t implies |A∩B| ≥ t·|A| and
    ≥ t·|B|, so under ANY global gram order the pair must share a gram
    inside each side's first |x|−⌈t·|x|⌉+1 grams. Candidates come from
    joining only those prefixes, then each candidate pair is verified
    with a full array_intersect — the verified Jaccard is exact, no
    estimate anywhere.

    The global order is the CROSS-SET refinement of AllPairs' rare-first
    canon: (batch-df, total-df, gram). Grams absent from the batch
    (df_b = 0, the overwhelming majority of a big corpus's vocabulary)
    sort FIRST, so they fill corpus-doc prefixes — and a df_b = 0 gram
    has no batch-side join partner, so those prefix entries emit
    nothing. A corpus doc only produces candidates when batch-shared
    grams SPILL into its prefix, i.e. when more than (1−t) of its grams
    are batch-covered — which is exactly the J ≥ t neighborhood.
    Measured at sf1: 47k candidate pairs vs 3.8M under plain rare-first
    and ~120M gram-pair mass under the naive full inverted-index join
    (23 s at sf0.1 → ~3 s; 30.6 s at sf1 → ~7 s).

    Scale: gram-df aggregate and the per-doc prefix build are linear
    scans (one doc-grain shuffle); corpus docs untouched by the tick's
    vocabulary never leave the prefix stage; the batch side (one ingest
    tick) broadcasts into both the prefix join and the verify join, so
    the corpus never re-partitions. Exact-int ratio + dround(4) per the
    driver hash contract."""
    docs = _t(spark, sf_dir, "documents")
    from ..operators.dedup import with_shingles

    t = 0.5
    batch = docs.filter(F.col("source") == "src1")
    corpus = docs.filter(F.col("source") != "src1")
    sh_b = with_shingles(batch, n=3).select(
        F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")
    )
    sh_c = with_shingles(corpus, n=3).select(
        F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")
    )
    # Checkpointed: each side feeds its prefix build AND the verify join;
    # lazy, the tokenize+shingle pipeline would recompute per consumer
    # (and the Generate-pushdown hazard in with_shingles' docstring).
    sh_b = sh_b.localCheckpoint(eager=True)
    sh_c = sh_c.localCheckpoint(eager=True)

    # Global gram order = (batch-df, total-df, gram): batch-absent grams
    # first (see docstring), rare-first within the batch-present tail.
    # Vocabulary-sized aggregate.
    # Checkpointed: both prefix() legs join it — lazy, the full-corpus
    # explode+aggregate (the dominant scan here) would run once per leg.
    gram_df = (
        sh_b.select(F.explode("sh_a").alias("g"), F.lit(1).alias("isb"))
        .unionAll(
            sh_c.select(F.explode("sh_b").alias("g"), F.lit(0).alias("isb"))
        )
        .groupBy("g")
        .agg(F.sum("isb").alias("df_b"), F.count(F.lit(1)).alias("df_t"))
        .localCheckpoint(eager=True)
    )

    def prefix(side: DataFrame, id_name: str, arr: str) -> DataFrame:
        # (doc, gram) → attach (df_b, df_t) → re-assemble the sorted gram
        # array → slice the Jaccard prefix |x| − ceil(t·|x|) + 1 →
        # explode it.
        exploded = side.select(id_name, F.explode(arr).alias("g")).join(
            gram_df, "g"
        )
        plen = F.size("grams") - F.ceil(F.lit(t) * F.size("grams")) + 1
        return (
            exploded.groupBy(id_name)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("df_b", "df_t", "g"))
                ).alias("grams")
            )
            .select(
                id_name,
                F.explode(
                    F.slice("grams", 1, plen.cast("int"))
                ).alias("pg"),
            )
            .select(id_name, F.col("pg.g").alias("g"))
        )

    cand = (
        F.broadcast(prefix(sh_b, "id_a", "sh_a"))
        .join(prefix(sh_c, "id_b", "sh_b"), "g")
        .select("id_a", "id_b")
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jacc = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    # Verify order keeps the corpus un-shuffled: the bare (id_a, id_b)
    # candidate list broadcasts INTO the corpus scan first (ids only —
    # no shingle arrays ride the broadcast), then the candidate-sized
    # result picks up the batch arrays from a second small broadcast.
    verified = (
        sh_c.join(F.broadcast(cand), "id_b")
        .join(F.broadcast(sh_b), "id_a")
        .select("id_a", jacc.alias("j"))
        .filter(F.col("j") >= t)
    )
    worst = verified.groupBy(F.col("id_a").alias("doc_id")).agg(
        F.max("j").alias("best_match")
    )
    gated = batch.join(F.broadcast(worst), "doc_id", "left_outer").withColumn(
        "rejected", F.coalesce(F.col("best_match"), F.lit(0.0)) >= 0.5
    )
    return gated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.count_if(F.col("rejected")).alias("n_rejected"),
        F.count_if(~F.col("rejected")).alias("n_admitted"),
        dround(F.max(F.when(F.col("rejected"), F.col("best_match"))), 4).alias(
            "worst_jaccard"
        ),
    )


@_q(
    "pipe_right_to_forget",
    """
    WITH req AS (SELECT doc_id FROM documents WHERE doc_id % 23 = 0),
    survivors AS (
      SELECT d.* FROM documents d LEFT JOIN req r ON d.doc_id = r.doc_id
      WHERE r.doc_id IS NULL),
    purged AS (
      SELECT d.source, d.doc_id FROM documents d JOIN req r ON d.doc_id = r.doc_id),
    vec_purged AS (
      SELECT d.source, e.vec_id
      FROM embeddings e JOIN req r ON e.vec_id = r.doc_id
      JOIN documents d ON d.doc_id = e.vec_id)
    SELECT s.source,
           count(*) AS n_after,
           coalesce(p.n_purged, 0) AS n_purged,
           coalesce(v.n_vec_purged, 0) AS n_vec_purged,
           min(s.doc_id) AS min_surviving
    FROM survivors s
    LEFT JOIN (SELECT source, count(*) AS n_purged FROM purged GROUP BY source) p
      ON s.source = p.source
    LEFT JOIN (SELECT source, count(*) AS n_vec_purged FROM vec_purged GROUP BY source) v
      ON s.source = v.source
    GROUP BY s.source, p.n_purged, v.n_vec_purged
    """,
)
def pipe_right_to_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade (the GDPR/takedown pipeline the
    reference's CDC delete events ultimately serve): a deletion-request
    set (doc_id % 23 == 0) propagates through every derived artifact —
    documents purge via ANTI-join, the 1:1 embedding rows purge with
    them, and the per-source report accounts for survivors, purged docs,
    and purged vectors in one pass. The same cascade drives
    llm_index_maintain's signed gram retractions; here the grade is the
    cross-artifact accounting.

    Scale: deletion-request batches are small by nature — the request set
    broadcasts to every join (docs anti, docs semi, embeddings semi), so
    each artifact is ONE scan with no table-vs-table shuffle; at 100 TB
    this is the only cascade shape that doesn't re-partition the corpus
    to forget 22 documents. Counts stay BIGINT (driver hash contract)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    req = docs.filter(F.col("doc_id") % 23 == 0).select("doc_id")
    survivors = docs.join(F.broadcast(req), "doc_id", "left_anti")
    # ONE semi-join materializes the request-sized (vec_id, source)
    # projection of the purged docs; both the per-source doc count and the
    # embedding purge derive from it (a second docs ⋉ req expression would
    # plan as a second full corpus scan — distinct expression ids defeat
    # reuse). Joining the FULL docs table into embeddings would likewise
    # be a corpus-vs-corpus shuffle; embeddings stay a single scan against
    # the broadcast.
    purged_docs = docs.join(F.broadcast(req), "doc_id", "left_semi").select(
        F.col("doc_id").alias("vec_id"), "source"
    ).localCheckpoint(eager=True)
    purged = purged_docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_purged")
    )
    vec_purged = (
        emb.join(F.broadcast(purged_docs), "vec_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_vec_purged"))
    )
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_after"),
            F.min("doc_id").alias("min_surviving"),
        )
        .join(F.broadcast(purged), "source", "left")
        .join(F.broadcast(vec_purged), "source", "left")
        .select(
            "source",
            "n_after",
            F.coalesce("n_purged", F.lit(0).cast("long")).alias("n_purged"),
            F.coalesce("n_vec_purged", F.lit(0).cast("long")).alias("n_vec_purged"),
            "min_surviving",
        )
    )
