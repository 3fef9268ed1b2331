"""Extended surface: SQL subqueries (Catalyst decorrelation), unpivot,
grouped-map pandas UDFs, and the multimodal plumbing as oracle-checked
queries (SURVEY.md §2.C UDF/LLM rows; BASELINE.json north star).

Subqueries run through ``spark.sql`` over registered views — IN / correlated
EXISTS / scalar subqueries are Catalyst rewrite territory (decorrelation to
semi/anti joins, SURVEY.md §4 "standard Spark, never reimplemented"); the
DataFrame-API equivalents (join_semi/join_anti) are covered in relational.py.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as _t
from ..functions import dround
from ..operators.multimodal import decode_images, frame_sample_plan, make_fake_media

from ._registry import make_registry

QUERIES, ORACLES, _q = make_registry()


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Register a fixture table as a temp view; return the view name."""
    _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return name


# ---------------------------------------------------------------- subqueries


@_q(
    "sql_subquery_in",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    """,
)
def sql_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery — Catalyst rewrites to a left-semi join;
    the inner distinct-key set broadcasts when small."""
    _view(spark, sf_dir, "orders"), _view(spark, sf_dir, "customer")
    return spark.sql(ORACLES["sql_subquery_in"])


@_q(
    "sql_subquery_exists",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def sql_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS — decorrelated to a left-anti join with the
    pushed-down price predicate on the build side."""
    _view(spark, sf_dir, "orders"), _view(spark, sf_dir, "customer")
    return spark.sql(ORACLES["sql_subquery_exists"])


@_q(
    "sql_subquery_scalar",
    """
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > 1.04 * (SELECT avg(p_retailprice) FROM part)
    """,
)
def sql_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery — one tiny agg job feeding a literal into
    the scan filter (no join at all in the final plan)."""
    _view(spark, sf_dir, "part")
    return spark.sql(ORACLES["sql_subquery_scalar"])


@_q(
    "unpivot_metrics",
    """
    SELECT c_mktsegment, 'total_acctbal' AS metric,
           round(sum(c_acctbal), 2) AS value
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment, 'n_customers' AS metric, count(*)::DOUBLE AS value
    FROM customer GROUP BY c_mktsegment
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long unpivot via ``stack`` (the inverse of pivot): per-segment
    metrics as (segment, metric, value) rows."""
    wide = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            dround(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.count(F.lit(1)).cast("double").alias("n_customers"),
        )
    )
    return wide.selectExpr(
        "c_mktsegment",
        "stack(2, 'total_acctbal', total_acctbal, 'n_customers', n_customers) AS (metric, value)",
    )


@_q(
    "scalar_map_ops",
    """
    SELECT event_id,
           'k' AS map_key,
           (props->>'k')::INT AS map_val,
           1 AS n_keys
    FROM events WHERE event_id < 2000
    """,
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (SURVEY.md §2.C scalar/map): parse JSON props into a
    map<string,int>, explode entries, count keys via map_keys. The fixture
    props carry a single key 'k', which keeps the oracle a plain JSON
    extract."""
    events = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json("props", "map<string,int>")
    return (
        events.withColumn("m", m)
        .select(
            "event_id",
            F.size(F.map_keys("m")).alias("n_keys"),
            F.explode("m").alias("map_key", "map_val"),
        )
        .select("event_id", "map_key", "map_val", "n_keys")
    )


# ------------------------------------------------------- grouped-map pandas


@_q(
    "udf_grouped_zscore",
    """
    SELECT event_id,
           event_type,
           round((value - avg(value) OVER w) / stddev_pop(value) OVER w, 3) AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-event-type z-score of
    `value`. The UDTF/UDAF shape of SURVEY.md §2.C — each group arrives as
    one Arrow-backed pandas frame; numpy does the math.

    Scale: one shuffle on the group key; group size must fit a worker's
    memory (event types are low-cardinality but huge — for skewed groups
    prefer the window-function form the oracle uses)."""
    import numpy as np

    events = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        pdf = pdf.copy()
        std = v.std(ddof=0)
        if std == 0 or pd.isna(std):
            # 0/0 is NULL in SQL (the oracle's stddev_pop path), not the
            # pandas NaN — singleton / constant-valued groups must agree.
            pdf["z"] = None
        else:
            z = (v - v.mean()) / std
            # Half-away-from-zero on the binary value (dround's contract)
            # — pandas Series.round is half-to-even, the exact rounding
            # mode the repo banned for oracle-compared output. Same exact
            # frac >= 0.5 form as functions.dround (no +0.5 double-round).
            a = (z.abs() * 1000).to_numpy()
            fl = np.floor(a)
            pdf["z"] = np.sign(z.to_numpy()) * (fl + (a - fl >= 0.5)) / 1000.0
        return pdf[["event_id", "event_type", "z"]]

    return events.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, z double"
    )


# ----------------------------------------------------------------- multimodal


@_q(
    "mm_decode_stats",
    """
    SELECT (doc_id % 7) AS size_class,
           count(*) AS n,
           round(avg((doc_id % 32 + 8) * (doc_id % 24 + 8)), 4) AS avg_pixels
    FROM documents GROUP BY 1
    """,
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing end-to-end: synthesize binary media blobs
    (dimensions encoded in an 8-byte header), decode via mapInPandas (Arrow
    batches), aggregate decoded dimensions. The oracle recomputes the same
    stats from the dimension formulas — proving the bytes→decode→stats path
    preserves the payload exactly."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 32 + 8).cast("int").alias("w"),
        (F.col("doc_id") % 24 + 8).cast("int").alias("h"),
    )
    media = make_fake_media(docs, "media_id", "w", "h")
    decoded = decode_images(media)
    return (
        decoded.withColumn("size_class", F.col("media_id") % 7)
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.avg(F.col("width").cast("long") * F.col("height")), 4).alias(
                "avg_pixels"
            ),
        )
    )


@_q(
    "mm_decode_codec",
    """
    SELECT (doc_id % 7) AS size_class,
           count(*) AS n,
           round(avg((doc_id % 32 + 8) * (doc_id % 24 + 8)), 4) AS avg_pixels,
           round(avg(doc_id % 256), 4) AS avg_mean_byte
    FROM documents GROUP BY 1
    """,
)
def mm_decode_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end, no imaging library: encode each doc's
    synthetic image as an actual container format — PPM (P6) for
    doc_id%4==0, 24-bit BMP for %4==1, zlib-compressed PNG for %4==2,
    baseline JPEG for %4==3 — with every pixel set to doc_id % 256, then
    strictly decode via the pure-Python codecs (operators/multimodal +
    operators/jpeg) through the same mapInPandas plumbing as any corpus
    decode. The JPEG docs additionally rotate through all three baseline
    chroma layouts by doc_id % 3 — 4:4:4, 4:2:0, and 4:2:2 (round-5
    addition) — so every sampling-factor geometry the decoder's generic
    MCU walk claims is exercised through the strict path AND the oracle.
    A solid-color image survives JPEG quantization and chroma box
    averaging EXACTLY (DC-only blocks, constant chroma), so the oracle
    can recompute the dimensions AND the per-image mean byte from the
    generating formulas even for the lossy format — a codec that
    mis-parses a header, drops row padding, swaps BGR/RGB channel math,
    corrupts the PNG inflate, misaligns the JPEG zigzag/quant tables, or
    mis-walks a subsampled MCU fails the hash, not just a unit test."""
    from collections.abc import Iterator

    import numpy as np

    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import encode_bmp, encode_png, encode_ppm

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 32 + 8).cast("int").alias("w"),
        (F.col("doc_id") % 24 + 8).cast("int").alias("h"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chroma = (False, "420", "422")  # 4:4:4 / 4:2:0 / 4:2:2 by id
        codecs = (encode_ppm, encode_bmp, encode_png, None)
        for pdf in batches:
            rows = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                m = int(mid)
                arr = np.full((int(h), int(w), 3), m % 256, dtype=np.uint8)
                if m % 4 == 3:
                    blob = encode_jpeg(arr, subsample=chroma[m % 3])
                else:
                    blob = codecs[m % 4](arr)
                rows.append({"media_id": m, "media": blob})
            yield pd.DataFrame(rows, columns=["media_id", "media"])

    media = docs.mapInPandas(gen, "media_id long, media binary")
    decoded = decode_images(media, strict=True)
    return (
        decoded.withColumn("size_class", F.col("media_id") % 7)
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.avg(F.col("width").cast("long") * F.col("height")), 4).alias(
                "avg_pixels"
            ),
            dround(F.avg("mean_byte"), 4).alias("avg_mean_byte"),
        )
    )


@_q(
    "mm_frame_sample",
    """
    SELECT doc_id AS media_id,
           unnest(range(0, (doc_id % 10 + 1) * 1000, 1000)) AS frame_ts_ms
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: each 'video' (duration derived from
    doc_id) expands to its 1 Hz frame timestamps — the explode-shaped plan
    where rows multiply but bytes don't."""
    vids = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit(b"").alias("media"),
            F.struct(
                F.lit("video").alias("media_type"),
                F.lit("fake").alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                ((F.col("doc_id") % 10 + 1) * 1000).alias("duration_ms"),
            ).alias("media_meta"),
        )
    )
    return frame_sample_plan(vids, every_ms=1000)


@_q(
    "scalar_array_ops",
    """
    SELECT doc_id,
           array_to_string(toks[2:4], ',')             AS mid_slice,
           array_to_string(list_sort(list_distinct(toks[1:5])), ',')
                                                       AS head_sorted,
           list_position(toks, 'the')                  AS first_the,
           len(flatten([toks[1:1], toks[3:3]]))        AS zip_len
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    WHERE len(toks) >= 6
    """,
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function slice (SURVEY.md §2.C scalar/array): slice,
    sort_array, array_distinct, array_position, flatten — all codegen'd
    JVM expressions over the token arrays."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ", -1)
    )
    # Array results are serialized to canonical CSV strings — the driver's
    # value-hasher cannot hash list cells (unhashable type); both sides agree.
    return docs.filter(F.size("toks") >= 6).select(
        "doc_id",
        F.array_join(F.slice("toks", 2, 3), ",").alias("mid_slice"),
        F.array_join(
            F.sort_array(F.array_distinct(F.slice("toks", 1, 5))), ","
        ).alias("head_sorted"),
        F.array_position("toks", "the").alias("first_the"),
        F.size(
            F.flatten(F.array(F.slice("toks", 1, 1), F.slice("toks", 3, 1)))
        ).alias("zip_len"),
    )


@_q(
    "scalar_bit_ops",
    """
    SELECT event_id,
           event_id & 255                         AS low_byte,
           event_id | 4096                        AS with_flag,
           xor(event_id, user_id)                 AS id_xor,
           event_id << 3                          AS shl3,
           event_id >> 2                          AS shr2,
           bit_count(event_id)                    AS popcount
    FROM events WHERE event_id < 3000
    """,
)
def scalar_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-operator slice: and/or/xor, shifts, popcount."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("id_xor"),
        F.shiftleft("event_id", 3).alias("shl3"),
        F.shiftright("event_id", 2).alias("shr2"),
        F.bit_count("event_id").alias("popcount"),
    )


@_q(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond cube/rollup, which relational.py
    covers) through the SQL surface — one Expand node, one aggregation."""
    _view(spark, sf_dir, "orders")
    return spark.sql(ORACLES["agg_grouping_sets"])


@_q(
    "sink_partitioned_readback",
    """
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus <> 'P'
    GROUP BY o_orderstatus
    """,
)
def sink_partitioned_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-path coverage (SURVEY.md §2.B B10 hive-style partitioning +
    §2.A A10 parquet sink): orders written ``partitionBy(o_orderstatus)``,
    read back with a partition predicate. The predicate prunes at directory
    level — the scan's PartitionFilters skip every file under
    ``o_orderstatus=P/`` instead of filtering rows (tests/test_plans.py
    asserts the pruned scan)."""
    out = tempfile.mkdtemp(prefix="spark_graft_partsink_")
    _t(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") != "P")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("o_totalprice"), 2).alias("total"),
    )


@_q(
    "scalar_regex",
    r"""
    SELECT doc_id,
           regexp_replace(text, '[aeiou]', '*', 'g')  AS devowel,
           len(regexp_extract_all(text, '\w{7,}'))    AS n_long_words,
           translate(lang, 'aeiou', 'AEIOU')          AS lang_t,
           regexp_matches(text, 'data')               AS has_data
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp-function slice (SURVEY.md §2.C scalar/string):
    regexp_replace (global in Spark, 'g' flag in the oracle),
    regexp_extract_all, translate, rlike — all JVM-side codegen'd."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id",
        F.regexp_replace("text", "[aeiou]", "*").alias("devowel"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w{7,}"), 0)).alias(
            "n_long_words"
        ),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_t"),
        F.col("text").rlike("data").alias("has_data"),
    )


@_q(
    "scalar_date_arith",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 45 DAY AS DATE)     AS due_date,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE)    AS review_date,
           last_day(o_orderdate)                           AS month_end,
           dayofweek(o_orderdate) + 1                      AS dow,
           quarter(o_orderdate)                            AS qtr,
           greatest(year(o_orderdate), 1996)               AS clamped_year
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic slice: interval add, add_months, last_day,
    dayofweek (Spark is 1-based Sunday=1; the oracle's 0-based dayofweek
    gets +1), quarter, greatest."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate").cast("date"), 45).alias("due_date"),
        F.add_months(F.col("o_orderdate").cast("date"), 2).alias("review_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.greatest(F.year("o_orderdate"), F.lit(1996)).alias("clamped_year"),
    )


@_q(
    "fuzzy_name_pairs",
    """
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE a.c_custkey <= 300 AND b.c_custkey <= 300
      AND levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: within-nation name pairs at edit distance
    ≤ 2 (levenshtein is JVM-side codegen). The equi-key (nationkey) rides
    the hash join; only the theta parts (key ordering, distance) evaluate
    post-join — blocking by a cheap key before an expensive string metric
    is the standard fuzzy-dedup shape at scale."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select("c_custkey", "c_name", "c_nationkey")
    )
    a = c.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("nk"),
    )
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("nk"),
    )
    return (
        a.join(b, ["nk"])
        .filter(F.col("a_key") < F.col("b_key"))
        .withColumn("edit_dist", F.levenshtein("a_name", "b_name"))
        .filter(F.col("edit_dist") <= 2)
        .select("a_key", "b_key", "edit_dist")
    )


@_q(
    "filter_nullsafe_eq",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderpriority,
             nullif(o_orderstatus, 'O') AS a,
             nullif(o_orderstatus, 'F') AS b
      FROM orders WHERE o_orderkey <= 2000)
    SELECT o_orderkey,
           a IS NOT DISTINCT FROM b            AS ns_eq,
           a IS NOT DISTINCT FROM NULL         AS ns_is_null,
           coalesce(a, b, '?')                 AS first_status,
           o_orderpriority ILIKE '%urgent%'    AS is_urgent
    FROM t
    """,
)
def filter_nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality `<=>` (SURVEY.md §2.C predicates): null <=> null
    is TRUE, null <=> x is FALSE — unlike `=` which yields NULL and drops
    rows in filters. Plus case-insensitive ILIKE. The oracle spells `<=>`
    as IS NOT DISTINCT FROM."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    a = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    b = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.select(
        "o_orderkey",
        a.eqNullSafe(b).alias("ns_eq"),
        a.eqNullSafe(F.lit(None).cast("string")).alias("ns_is_null"),
        F.coalesce(a, b, F.lit("?")).alias("first_status"),
        F.col("o_orderpriority").ilike("%urgent%").alias("is_urgent"),
    )


@_q(
    "sink_csv_roundtrip",
    """
    SELECT c_mktsegment, count(*) AS n,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + scan (SURVEY.md §2.C scans row): customer written as
    headered CSV, read back with an EXPLICIT schema (inference is a full
    extra pass over the data — never at 100 TB), aggregated. Exactness
    through the text round-trip is part of the check: doubles survive via
    CSV's full-precision default format."""
    out = tempfile.mkdtemp(prefix="spark_graft_csvsink_")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    cust.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "c_custkey bigint, c_mktsegment string, c_acctbal double"
    ).option("header", True).csv(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@_q(
    "join_salted_skew",
    """
    WITH f AS (SELECT CASE WHEN user_id < 75 THEN 1 ELSE user_id END AS k,
                      value
               FROM events),
         d AS (SELECT c_custkey AS k, c_mktsegment FROM customer
               WHERE c_custkey < 150)
    SELECT c_mktsegment, count(*) AS n, round(sum(value), 3) AS total
    FROM f JOIN d USING (k)
    GROUP BY c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted hot-key join (SURVEY.md §2.C joins / skew note): half the
    fact rows are collapsed onto key 1 (which matches a dim row — custkeys
    start at 1) — the pathological hot key that would pin one task in a
    plain shuffle join. `salted_join` spreads key 1 over 8 salt buckets; results are salt-invariant, which is exactly
    what the oracle (plain unsalted join) verifies."""
    from ..operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") < 75, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("k"),
        "value",
    )
    dim = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 150)
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
    )
    joined = salted_join(ev, dim, on=["k"], n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("value"), 3).alias("total"),
    )


@_q(
    "join_range_binned",
    """
    SELECT p_brand, count(*) AS n_in_band, round(avg(l_quantity), 4) AS avg_qty
    FROM part JOIN lineitem
      ON l_quantity BETWEEN p_size - 2 AND p_size + 2
    WHERE p_partkey <= 50
    GROUP BY p_brand
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE range join (no equi key) via binning
    (operators/rangejoin.py): quantity-in-[size±2] would be a
    BroadcastNestedLoopJoin as written in the oracle; the engine quantizes
    to width-5 bins and hash-joins on bin id + exact refine — same rows,
    linear plan (tests/test_plans.py asserts no NestedLoop)."""
    from ..operators.rangejoin import binned_range_join

    li = _t(spark, sf_dir, "lineitem").select("l_quantity")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 50)
        .select(
            "p_brand",
            (F.col("p_size") - 2).alias("lo"),
            (F.col("p_size") + 2).alias("hi"),
        )
    )
    joined = binned_range_join(li, p, "l_quantity", "lo", "hi", bin_width=5)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_in_band"),
        dround(F.avg("l_quantity"), 4).alias("avg_qty"),
    )


@_q(
    "scalar_posexplode",
    """
    SELECT doc_id, u.i - 1 AS pos, d.toks[u.i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 50) d,
         unnest(generate_series(1, len(d.toks))) AS u(i)
    """,
)
def scalar_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator functions (SURVEY.md §2.C array/explode): posexplode
    keeps the element ordinal — the UDTF shape for token-position
    features. The oracle unnests a generated 1-based subscript series
    (this DuckDB lacks WITH ORDINALITY), hence the -1."""
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .withColumn("toks", F.split("text", " ", -1))
    )
    return docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )


@_q(
    "window_time_range",
    """
    SELECT user_id, event_id,
           count(*) OVER w AS n_last_hour,
           round(sum(value) OVER w, 3) AS v_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame (SURVEY.md §2.C windows): trailing-1-hour
    per-user aggregates. Spark's rangeBetween is numeric, so the ordering
    key is exact epoch MICROseconds (the fixture's native precision after
    the catalog's nanos conversion) — second-granularity keys would merge
    sub-second peers the oracle's native-timestamp RANGE keeps apart."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        dround(F.sum("value").over(w), 3).alias("v_last_hour"),
    )


@_q(
    "agg_listagg",
    """
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_custkey) AS names,
           count(*) AS n
    FROM customer WHERE c_custkey <= 60
    GROUP BY c_nationkey
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — listagg WITHIN GROUP (deterministic
    via the explicit ORDER BY; unordered listagg is partition-order-
    dependent and would never hash-match an oracle)."""
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_custkey) AS names,
               count(*) AS n
        FROM customer WHERE c_custkey <= 60
        GROUP BY c_nationkey
        """
    )


@_q(
    "scalar_try_ops",
    """
    SELECT event_id,
           TRY_CAST(event_type AS INTEGER)              AS type_as_int,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           round(value / nullif(event_id % 3, 0), 3)    AS v_div
    FROM events WHERE event_id < 2000
    """,
)
def scalar_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar functions: try_cast (malformed → NULL, no task
    failure — at 100 TB one dirty row must not kill a stage) and
    try_divide (÷0 → NULL; the oracle's NULLIF denominator is the ANSI
    equivalent)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.col("event_type").try_cast("int").alias("type_as_int"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        dround(
            F.try_divide(F.col("value"), F.col("event_id") % 3), 3
        ).alias("v_div"),
    )


@_q(
    "join_interval_overlap",
    """
    WITH w AS (
      SELECT o_orderkey,
             CAST(epoch(o_orderdate) AS BIGINT)                          AS lo,
             CAST(epoch(o_orderdate + INTERVAL 7 DAY) AS BIGINT)         AS hi
      FROM orders WHERE o_orderkey <= 2000)
    SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key
    FROM w a JOIN w b
      ON a.o_orderkey < b.o_orderkey AND a.lo <= b.hi AND b.lo <= a.hi
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval OVERLAP join via binning
    (operators/rangejoin.py `binned_interval_join`): 7-day order
    fulfillment windows that overlap. The oracle's plain theta join is the
    nested-loop shape; the engine bins epoch-seconds at the interval
    length (one week) so each overlapping pair hash-joins in exactly one
    bin — no distinct, no nested loop."""
    from ..operators.rangejoin import binned_interval_join

    w = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("lo"),
            (F.unix_timestamp("o_orderdate") + 7 * 86400).alias("hi"),
        )
    )
    a = w.select(
        F.col("o_orderkey").alias("a_key"),
        F.col("lo").alias("alo"),
        F.col("hi").alias("ahi"),
    )
    b = w.select(
        F.col("o_orderkey").alias("b_key"),
        F.col("lo").alias("blo"),
        F.col("hi").alias("bhi"),
    )
    return (
        binned_interval_join(a, b, "alo", "ahi", "blo", "bhi", bin_width=7 * 86400)
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key")
    )


@_q(
    "agg_decimal_exact",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_disc,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation (money semantics, SURVEY.md §2.C scalar
    types): sums accumulate in DECIMAL — no floating partial-sum order
    sensitivity, the property double-based sums lack — and only the final
    single value casts to DOUBLE for the cross-engine compare. Spark keeps
    decimal partials in unscaled longs inside the hash aggregate, so the
    exactness costs nothing at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
        F.sum(dec("l_discount")).cast("double").alias("sum_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@_q(
    "window_cume_dist",
    """
    SELECT c_mktsegment, c_custkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           ntile(10) OVER w AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist / ntile)
    per market segment — the remaining ranking-family members not covered
    by window_rank_ntile. Ordering carries the unique c_custkey tiebreak
    so ranks are total and deterministic. One shuffle on the partition
    key; the rank math is rational arithmetic over row counts, identical
    across engines."""
    cust = _t(spark, sf_dir, "customer")
    from pyspark.sql import Window as W

    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        dround(F.percent_rank().over(w), 6).alias("pr"),
        dround(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    )


@_q(
    "agg_corr_covar",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_covar,
           round(var_samp(l_quantity), 4) AS qty_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates (corr / covar_samp / var_samp —
    the §2.C aggregation-family members not covered elsewhere). Spark
    computes these as single-pass mergeable co-moments (partial+final, no
    re-scan), the same shape as sum/count at 100 TB; 4dp rounding absorbs
    the partial-merge-order float noise."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        dround(F.covar_samp("l_quantity", "l_discount"), 4).alias("qty_disc_covar"),
        dround(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


@_q(
    "window_first_last",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_price,
           dense_rank() OVER w AS dr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic value functions (first_value / last_value / nth_value) +
    dense_rank — the remaining §2.C window members. last/nth carry the
    full-partition frame explicitly (the default frame stops at
    CURRENT ROW, a classic cross-engine trap); ordering includes the
    unique o_orderkey so every value is deterministic."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    grow = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = grow.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(grow).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        F.dense_rank().over(grow).alias("dr"),
    )


@_q(
    "scalar_variant",
    """
    SELECT (props->>'$.k')::INT % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum((props->>'$.k')::INT) AS BIGINT) AS k_sum,
           round(sum(CAST(round(value * 1000, 0) AS BIGINT)) / 1000.0, 3)
             AS value_sum
    FROM events GROUP BY 1
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` the props
    column into a VARIANT and extract with ``variant_get`` path syntax —
    the open-ended-schema alternative to the declared-StructType envelope
    (A6). VARIANT stores a parsed binary form, so repeated extractions
    skip re-tokenizing the JSON text — the right shape for 100 TB of
    heterogenous event payloads; value sums use the ×1000 integer trick
    for partition-order independence."""
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    vint = dround(F.col("value") * 1000, 0).cast("long")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"), vint.alias("vint"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            dround(F.sum("vint") / 1000.0, 3).alias("value_sum"),
        )
    )


@_q(
    "sink_clustered_readback",
    """
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1994-03-31'
    GROUP BY l_returnflag
    """,
)
def sink_clustered_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered layout for data skipping (the flat-table sibling of
    B10's directory pruning): lineitem is written with
    ``sortWithinPartitions(l_shipdate)``, so every parquet row group's
    min/max footer stats span a narrow date range, and the readback's
    BETWEEN filter — pushed into the scan (tests/test_plans.py) — skips
    whole row groups instead of filtering rows. At 100 TB this is the
    Z-order/clustering technique: the query predicate column decides the
    write-time sort, and pruning happens in the reader with no index."""
    out = tempfile.mkdtemp(prefix="spark_graft_clustsink_")
    (
        _t(spark, sf_dir, "lineitem")
        .select("l_shipdate", "l_returnflag", "l_extendedprice")
        .repartition(4)
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("l_shipdate").between("1994-01-01", "1994-03-31")
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@_q(
    "agg_skew_twophase",
    """
    SELECT event_type, count(*) AS n,
           round(sum(CAST(round(value * 1000, 0) AS BIGINT)) / 1000.0, 3)
             AS total,
           round(max(value), 3) AS vmax
    FROM events GROUP BY event_type
    """,
)
def agg_skew_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation for skewed group keys: phase 1
    aggregates (key, salt) — spreading a hot key over 16 reducers — and
    phase 2 merges the salted partials per key. Catalyst's own partial
    aggregation already handles MOST skew (map-side combine), but when a
    single key's PARTIALS still overwhelm one reducer (huge cardinality
    per partition, e.g. collect-style aggs), explicit salting is the
    manual fix; this query grades the pattern's correctness — salting
    must be invisible in the result (same oracle as a plain groupBy).
    Sums ride the ×1000 integer trick for order independence."""
    ev = _t(spark, sf_dir, "events")
    vint = dround(F.col("value") * 1000, 0).cast("long")
    salted = (
        ev.withColumn("__salt", (F.col("event_id") % 16).cast("int"))
        .withColumn("__vint", vint)
        .groupBy("event_type", "__salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("__vint").alias("psum"),
            F.max("value").alias("pmax"),
        )
    )
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        dround(F.sum("psum") / 1000.0, 3).alias("total"),
        dround(F.max("pmax"), 3).alias("vmax"),
    )


@_q(
    "sink_orc_roundtrip",
    """
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 2) AS total_price,
           round(sum(CAST(round(l_discount * 100) AS BIGINT))
                 / (100.0 * count(l_discount)), 4) AS avg_disc
    FROM lineitem WHERE l_quantity >= 25
    GROUP BY l_returnflag
    """,
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan (SURVEY.md §2.C scans/sinks row — the second
    columnar format next to parquet): a lineitem projection written as
    ORC, read back, filtered and aggregated. The read-back filter
    exercises ORC's predicate pushdown path (Spark pushes `l_quantity >=
    25` into the ORC reader the same way it does for parquet; at 100 TB
    stripe-level min/max skipping does the pruning)."""
    out = tempfile.mkdtemp(prefix="spark_graft_orcsink_")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out).filter(F.col("l_quantity") >= 25)
    # ×100-integer sum for the 2dp-quantized discount: a rounded plain
    # double avg is partial-sum-order sensitive at the 4dp half-boundary
    # (the documented "quantized avg" class); sum(int)/(100·count) is one
    # float division on exact integers, identical in both engines.
    dint = dround(F.col("l_discount") * 100, 0).cast("long")
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("l_extendedprice"), 2).alias("total_price"),
        dround(
            F.sum(dint) / (F.lit(100.0) * F.count(F.col("l_discount"))), 4
        ).alias("avg_disc"),
    )


@_q(
    "source_jsonl_roundtrip",
    """
    SELECT event_type, count(*) AS n,
           round(sum(value), 3) AS total_value,
           min(event_id) AS min_id, max(event_id) AS max_id
    FROM events WHERE value > 10
    GROUP BY event_type
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source (SURVEY.md §2.C scans row — the
    text-format sibling of the CSV round-trip, and the file-level
    counterpart of the from_json envelope path): events written as
    newline-delimited JSON, read back with an EXPLICIT schema (a schema
    inference pass is a full extra read — never at 100 TB), filtered and
    aggregated. Doubles survive the text round-trip at full precision;
    the timestamp column is excluded (JSON timestamp serialization is
    engine-config-dependent, and the query contract is about the scan
    path, not timestamp text formats)."""
    out = tempfile.mkdtemp(prefix="spark_graft_jsonl_")
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "user_id"
    )
    ev.write.mode("overwrite").json(out)
    back = (
        spark.read.schema("event_id bigint, event_type string, value double, user_id bigint")
        .json(out)
        .filter(F.col("value") > 10)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("value"), 3).alias("total_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


def _hourly_type_grid(spark: SparkSession, sf_dir: str):
    """Shared scaffold for ts_gap_fill / analytics.ts_interpolate: the
    hourly per-type rollup ``b`` (localCheckpointed — it feeds bounds,
    grid AND the join, one events scan total) and the dense
    (event_type × hour) ``grid`` spanning the rollup's own min/max hour.
    Returns (b, grid)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
    )
    # ×1000-integer sum, not avg(double): value is 3dp-quantized, and a
    # rounded plain avg is partial-sum-order sensitive — measured 294 of
    # 3385 (type, hour) groups at sf0.01 land EXACTLY on the 3-decimal
    # half-boundary, so an AQE re-partition could flip dround(avg) against
    # the oracle. sum(int)/(1000·count) is one float division on exact
    # integers — identical operands in both engines, then dround matches.
    vint = dround(F.col("value") * 1000, 0).cast("long")
    b = ev.groupBy("event_type", "h").agg(
        dround(
            F.sum(vint) / (F.lit(1000.0) * F.count(F.col("value"))), 3
        ).alias("v")
    ).localCheckpoint(eager=False)
    bounds = b.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        b.select("event_type")
        .distinct()
        .crossJoin(bounds)
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"),
        )
    )
    return b, grid


@_q(
    "ts_gap_fill",
    """
    WITH b AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS h,
             round(sum(CAST(round(value * 1000) AS BIGINT))
                   / (1000.0 * count(value)), 3) AS v
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT min(time_bucket(INTERVAL 1 HOUR, ts)) AS lo,
                      max(time_bucket(INTERVAL 1 HOUR, ts)) AS hi
               FROM events),
    grid AS (
      SELECT t.event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM (SELECT DISTINCT event_type FROM events) t, bounds)
    SELECT g.event_type, CAST(epoch(g.h) AS BIGINT) AS h,
           last_value(v IGNORE NULLS) OVER
             (PARTITION BY g.event_type ORDER BY g.h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           v IS NULL AS is_gap
    FROM grid g LEFT JOIN b USING (event_type, h)
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill (the hypertable `time_bucket_gapfill`
    / `locf` pattern): hourly per-type averages projected onto a dense
    hour grid (sequence + explode — generated, never collected), missing
    buckets forward-filled with the last observed value via
    `last(ignorenulls)` over a running frame, and flagged.

    Scale: ONE scan of events (the hourly rollup); the hour bounds and
    the type list are both derived from the rollup itself — every event
    lands in some bucket, so min/max bucket and the distinct types are
    identical to raw-table answers at rollup cost. The left join and the
    forward-fill window then run on rollup-sized data — at 100 TB of
    events the grid is still only |types| × |hours|. The fill window
    partitions by type: parallel across types, sequential only within
    one type's timeline (a year is 8 760 rows — nothing)."""
    from pyspark.sql import Window as W

    b, grid = _hourly_type_grid(spark, sf_dir)
    fill = W.partitionBy("event_type").orderBy("h").rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        grid.join(b, ["event_type", "h"], "left")
        .withColumn("v_filled", F.last("v", ignorenulls=True).over(fill))
        # Epoch seconds, not raw TIMESTAMP: collect() renders timestamps
        # in the DRIVER OS timezone (review-confirmed parity failure under
        # TZ=America/New_York) — the surface rule is dates/epoch ints only.
        .select(
            "event_type",
            F.unix_timestamp("h").alias("h"),
            "v_filled",
            F.col("v").isNull().alias("is_gap"),
        )
    )


@_q(
    "udtf_doc_chunks",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    n AS (
      SELECT doc_id, t,
             greatest(cast(ceil(len(t) / 20.0) AS BIGINT), 1) AS nchunks
      FROM toks)
    SELECT doc_id,
           cast(unnest(range(0, nchunks)) AS INT) AS chunk_idx,
           cast(unnest(list_transform(range(0, nchunks),
                                      i -> least(20, len(t) - i * 20)))
                AS INT) AS n_tokens
    FROM n
    """,
)
def udtf_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (SURVEY.md §2.C UDF/UDAF/UDTF row — the table-function
    API surface itself, Spark 3.5+/4.x `@udtf`): one input document row →
    N chunk rows via a lateral join, the canonical UDTF shape.

    Scale note: a row-at-a-time Python UDTF is the SLOW lane — the
    equivalent generator plan (`pipe_chunk_documents`: split + sequence +
    explode, whole-stage codegen, zero Python) is the 100 TB path and is
    graded separately. This entry pins the API's semantics (lateral
    multiplicity, typed output rows, empty-doc floor) so either lane must
    agree; use it where the per-row logic genuinely can't be expressed in
    built-ins (external tokenizers, stateful parsers)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int")
    class ChunkDoc:
        def eval(self, text: str):
            # string_split semantics exactly (the oracle's): '' splits to
            # [''], empties are KEPT — dropping them would disagree with
            # the oracle on empty/multi-space documents.
            toks = (text or "").split(" ")
            n_chunks = max((len(toks) + 19) // 20, 1)
            for i in range(n_chunks):
                yield i, min(20, len(toks) - i * 20)

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs_src")
    return spark.sql(
        "SELECT doc_id, c.chunk_idx, c.n_tokens "
        "FROM udtf_docs_src, LATERAL chunk_doc(text) AS c"
    )


@_q(
    "sql_recursive_cte",
    """
    WITH RECURSIVE chain AS (
      SELECT c_custkey, c_custkey AS root, 0 AS depth
      FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, ch.root, ch.depth + 1
      FROM customer c JOIN chain ch ON c.c_custkey // 10 = ch.c_custkey
      WHERE c.c_custkey >= 10)
    SELECT root, depth, count(*) AS n,
           min(c_custkey) AS min_key, max(c_custkey) AS max_key
    FROM chain GROUP BY root, depth
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE — iterative SQL inside one
    statement): customers form an implicit decimal tree (parent =
    custkey div 10); the recursion walks every root's subtree computing
    depth, then aggregates subtree shape per (root, depth).

    Scale: each recursion step is one hash join of the frontier against
    the table — the same plan an iterative driver loop would build, but
    planned once; depth is log10(maxkey) ≈ 7 at 100 TB, so the step
    count stays tiny while each step is fully distributed. (Unbounded
    graph recursion at scale still belongs to the dedicated operators —
    operators/components.py — which pre-partition and batch rounds.)"""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("rcte_customer")
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey, c_custkey AS root, 0 AS depth
          FROM rcte_customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, ch.root, ch.depth + 1
          FROM rcte_customer c JOIN chain ch ON c.c_custkey DIV 10 = ch.c_custkey
          WHERE c.c_custkey >= 10)
        SELECT root, depth, count(*) AS n,
               min(c_custkey) AS min_key, max(c_custkey) AS max_key
        FROM chain GROUP BY root, depth
        """
    )


@_q(
    "agg_skew_kurtosis",
    """
    WITH mu AS (SELECT event_type, avg(value) AS m FROM events GROUP BY 1)
    SELECT e.event_type,
           round(avg(pow(value - m, 3))
                 / pow(avg(pow(value - m, 2)), 1.5), 3) AS skew,
           round(avg(pow(value - m, 4))
                 / pow(avg(pow(value - m, 2)), 2) - 3, 3) AS kurt,
           round(stddev_samp(value), 3) AS sd
    FROM events e JOIN mu USING (event_type)
    GROUP BY e.event_type
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates: Spark's single-pass skewness/kurtosis
    (population excess formulas, co-moment updates — one scan, partial
    aggregation) checked against the oracle's two-pass textbook
    computation; agreement to 3 decimals pins both the formula
    (population, excess) and the numerical stability of the streaming
    co-moment path on 20k-row groups."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        dround(F.skewness("value"), 3).alias("skew"),
        dround(F.kurtosis("value"), 3).alias("kurt"),
        dround(F.stddev_samp("value"), 3).alias("sd"),
    )


@_q(
    "set_ops_all",
    """
    SELECT n_nationkey FROM (
      (SELECT c_nationkey AS n_nationkey FROM customer WHERE c_acctbal > 0
       INTERSECT ALL
       SELECT s_nationkey FROM supplier)
      UNION ALL
      (SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
       EXCEPT ALL
       SELECT s_nationkey FROM supplier))
    """,
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (INTERSECT ALL / EXCEPT ALL — the
    bag-semantics siblings of set_ops_nations): duplicate-preserving
    intersection and difference over nation keys. Spark plans both as
    hash aggregates with count arithmetic (no row explosion), same as
    the oracle's semantics."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    a = cust.filter(F.col("c_acctbal") > 0).select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    b = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    return a.intersectAll(supp).unionAll(b.exceptAll(supp))


@_q(
    "mm_audio_stats",
    """
    WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 10),
    p AS (SELECT media_id, 1600 + media_id * 160 AS n FROM ids),
    s AS (SELECT media_id, n, unnest(range(0, n)) AS i FROM p),
    v AS (SELECT media_id, n,
                 ((media_id * 7 + i) % 256 - 128) * 100 AS x
          FROM s)
    SELECT media_id, 16000 AS sample_rate, n AS n_samples,
           n * 1000 // 16000 AS duration_ms,
           round(sqrt(avg(x * x)), 3) AS rms,
           cast(max(abs(x)) AS INT) AS peak
    FROM v GROUP BY media_id, n
    """,
)
def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality end-to-end with REAL container bytes (the WAV
    sibling of mm_decode_codec): deterministic int16 PCM clips are
    RIFF/WAVE-encoded per row (operators/multimodal.encode_wav inside a
    pandas UDF), then decoded DISTRIBUTEDLY by decode_audio (mapInPandas
    chunk-walk + numpy) into sample_rate / duration / RMS / peak — and
    the oracle recomputes the same stats from the signal formula alone,
    so a hash match proves the byte container round-trips losslessly.

    Scale: one Arrow pass per clip, binary column never leaves the
    executor; at 100 TB this is the binaryFile-source → mapInPandas
    feature-extraction shape (sources/binary.py), with compressed codecs
    (MP3/FLAC) behind the same capability-gate pattern as PIL."""
    import numpy as np

    from ..operators.multimodal import decode_audio, encode_wav

    @F.pandas_udf("binary")
    def make_wav(media_id: pd.Series) -> pd.Series:
        out = []
        for m in media_id:
            n = 1600 + int(m) * 160
            i = np.arange(n, dtype="int64")
            samples = (((int(m) * 7 + i) % 256 - 128) * 100).astype("int16")
            out.append(encode_wav(samples))
        return pd.Series(out)

    clips = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select(F.col("doc_id").alias("media_id"))
        .withColumn("media", make_wav("media_id"))
    )
    stats = decode_audio(clips)
    return stats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        dround(F.col("rms"), 3).alias("rms"),
        "peak",
    )


@_q(
    "agg_multi_distinct",
    """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT cast(ts AS DATE)) AS n_days,
           round(sum(value), 3) AS total
    FROM events GROUP BY event_type
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT(DISTINCT ...) over different columns in one
    aggregate — Catalyst plans this with an Expand node (one replicated
    row per distinct-group), then a two-level aggregate, so BOTH
    distincts resolve in a single shuffle pass instead of one job each.

    Scale: Expand multiplies the shuffled rows by the number of distinct
    groups (here 3: two distincts + the plain aggregates) — the standard
    trade; when a column's cardinality makes exact counting too hot,
    the approx_count_distinct family (agg_approx_distinct,
    agg_hll_sketch) is the documented escape hatch."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_days"),
        dround(F.sum("value"), 3).alias("total"),
    )


@_q(
    "sql_lateral_topk",
    """
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n,
         LATERAL (SELECT c_name, c_acctbal FROM customer
                  WHERE customer.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (the SQL
    form of top-k-per-group): each nation pulls its two richest
    customers. Catalyst decorrelates this to the same ranked-window plan
    the DataFrame form (window_topk_per_group) produces — one shuffle on
    the correlation key, no per-outer-row re-execution. The tie-break on
    c_name makes the top-2 set deterministic, so the oracle's LATERAL
    (DuckDB executes it natively) must agree exactly."""
    _view(spark, sf_dir, "nation"), _view(spark, sf_dir, "customer")
    return spark.sql(ORACLES["sql_lateral_topk"])


from ..functions import zorder_key as _zorder_key  # noqa: E402


@_q(
    "sink_zorder_readback",
    """
    SELECT count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue,
           min(l_orderkey) AS min_order
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 20 AND 60
    """,
)
def sink_zorder_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustered layout — the TWO-dimensional sibling of
    sink_clustered_readback: lineitem is range-partitioned and sorted by
    a Morton key interleaving (l_partkey, l_suppkey) bits, so parquet
    row-group min/max footers are narrow in BOTH dimensions at once and
    a conjunctive 2-D range predicate skips row groups on either column.
    A single-column sort gives perfect skipping on one dimension and
    none on the other; Z-order trades a little of each for locality in
    both — the standard technique (Delta OPTIMIZE ZORDER, Hudi
    clustering) for multi-predicate scan-heavy tables at 100 TB.

    The key is 32 pure bit-expressions (whole-stage codegen, no UDF);
    the oracle reads the ORIGINAL table — content invariance through the
    re-layout is part of the check."""
    out = tempfile.mkdtemp(prefix="spark_graft_zorder_")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # Size the interleave from the data: with FIXED 16-bit slices, any key
    # >= 2^16 contributes only its low bits and the Z-locality silently
    # collapses on that dimension (exactly the sf1+ regime).
    from ..functions import adaptive_zorder_bits

    bits = adaptive_zorder_bits(li, "l_partkey", "l_suppkey")
    (
        li.withColumn(
            "_z", _zorder_key(F.col("l_partkey"), F.col("l_suppkey"), bits)
        )
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("l_partkey").between(100, 300) & F.col("l_suppkey").between(20, 60)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.min("l_orderkey").alias("min_order"),
    )


@_q(
    "source_python_datasource",
    """
    WITH g AS (SELECT unnest(range(0, 2000)) AS i),
    feed AS (
      SELECT CASE WHEN i % 10 = 0 THEN 'd'
                  WHEN i % 10 = 5 THEN 'u' ELSE 'c' END AS op,
             i AS lsn, i % 97 AS key,
             ((i * 31) % 1000) / 10.0 AS amount
      FROM g)
    SELECT op, count(*) AS n, round(sum(amount), 2) AS total,
           count(DISTINCT key) AS n_keys, max(lsn) AS max_lsn
    FROM feed GROUP BY op
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DATA SOURCE end-to-end (Spark 4 Python Data Source
    API, sources/pydatasource.py): register the synthetic changefeed
    source, read 2000 rows across 8 planned input partitions, aggregate.
    Every row is a pure function of its index, so the oracle replays the
    content contract exactly — what's actually under test is the source
    machinery: registration, declared schema, partition planning,
    per-partition iteration, Arrow batching. Filter pushdown into the
    source (skip generation at the origin) is pinned separately in
    tests/test_operators.py."""
    from ..sources.pydatasource import register_changefeed

    # Monotone use-site declaration (the ensure_read_confs pattern): a
    # reader that implements pushFilters refuses to run without this.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_changefeed(spark)
    feed = (
        spark.read.format("changefeed")
        .option("rows", "2000")
        .option("partitions", "8")
        .load()
    )
    return feed.groupBy("op").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("amount"), 2).alias("total"),
        F.countDistinct("key").alias("n_keys"),
        F.max("lsn").alias("max_lsn"),
    )


@_q(
    "sink_python_format_roundtrip",
    """
    SELECT event_type, count(*) AS n,
           round(sum(value), 3) AS total, max(event_id) AS max_id
    FROM events WHERE event_id < 5000
    GROUP BY event_type
    """,
)
def sink_python_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A COMPLETE custom file format through the Python Data Source API,
    both directions (sources/pydatasource.AvroLogDataSource): events rows
    are written as length-prefixed Avro records via per-task two-phase
    commit (temp file → commit-time rename; failed tasks can never leak
    partial output into a reader's listing), then read back with one task
    per part file and a DECLARED schema, and aggregated. The oracle reads
    the original table — exactness through the engine's own wire format
    and the custom-format machinery is the check."""
    from ..sources.pydatasource import register_avrolog

    register_avrolog(spark)
    out = tempfile.mkdtemp(prefix="spark_graft_avrolog_")
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 5000).select(
        "event_id", "event_type", "value"
    )
    ddl = "event_id bigint, event_type string, value double"
    ev.write.format("avrolog").option("ddl", ddl).mode("overwrite").save(out)
    back = spark.read.format("avrolog").option("ddl", ddl).load(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("value"), 3).alias("total"),
        F.max("event_id").alias("max_id"),
    )


@_q(
    "udf_arrow_batch",
    """
    SELECT vec_id, round(norm, 4) AS norm, n_dims
    FROM (SELECT vec_id,
                 sqrt(list_reduce(list_transform(embedding, x -> x*x),
                                  (a, b) -> a + b)) AS norm,
                 len(embedding) AS n_dims
          FROM embeddings)
    """,
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (the UDF family's lowest-overhead lane): RecordBatches
    flow straight from Tungsten into pyarrow with NO pandas
    materialization — for numeric kernels the pandas Series wrapper is
    pure overhead, and at 100 TB the per-batch copy it avoids is real
    money. The kernel computes L2 norms via zero-copy numpy views over
    the Arrow buffers; the oracle recomputes with list arithmetic."""
    import math as _math
    from collections.abc import Iterator

    import pyarrow as pa

    def norms(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for batch in batches:
            col = batch.column(batch.schema.get_field_index("embedding"))
            if col.null_count:
                # flatten() drops null entries while offsets keep them —
                # a null list would silently misalign every later row.
                raise ValueError("udf_arrow_batch: null embedding lists")
            # float64 up-cast BEFORE squaring: prefix-sum differencing in
            # float32 cancels catastrophically on long segments.
            vals = col.flatten().to_numpy(zero_copy_only=False).astype("float64")
            offs = col.offsets.to_numpy(zero_copy_only=False).astype("int64")
            offs = offs - offs[0]  # sliced batches carry a nonzero base
            # Segment sums via prefix sums: exact for EMPTY lists too,
            # where np.add.reduceat would double-count or walk off the end.
            csum = np.concatenate(([0.0], np.cumsum(vals * vals)))
            sq = csum[offs[1:]] - csum[offs[:-1]]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("vec_id")),
                    pa.array(np.sqrt(sq), type=pa.float64()),
                    pa.array((offs[1:] - offs[:-1]).astype("int32")),
                ],
                names=["vec_id", "norm", "n_dims"],
            )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = emb.mapInArrow(norms, "vec_id bigint, norm double, n_dims int")
    return out.select("vec_id", dround(F.col("norm"), 4).alias("norm"), "n_dims")


@_q(
    "obs_scan_metrics",
    """
    SELECT count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS total_price,
           count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
    FROM lineitem WHERE l_quantity >= 30
    """,
)
def obs_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API: side-channel metrics accumulated DURING a
    query's one pass (no second scan) — the pattern for data-quality
    counters riding production jobs (rows seen, nulls, domain
    violations) at zero extra I/O. The observed values are returned as a
    one-row DataFrame and must equal the oracle's directly-computed
    aggregates; the action that materializes them is a count on the
    observed frame, not a separate metrics query."""
    import uuid as _uuid

    from pyspark.sql import Observation

    # Run the observed pass in a CHILD session: the Observation registers a
    # QueryExecutionListener that outlives this query, and listener event
    # delivery lazily re-analyzes later query plans — if one of those scans
    # a directory that table retention has since deleted (KeyedTable
    # snapshot trim), the listener throws on the caller's session. The
    # child session's listener bus filters the caller's events out, so the
    # side channel can never observe (or break on) anyone else's queries.
    sess = spark.newSession()
    li = _t(sess, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    # Unique name per invocation: observation names are session-scoped,
    # and the driver/parity may run one query several times per session.
    obs = Observation(f"scan_metrics_{_uuid.uuid4().hex[:8]}")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        dround(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the single pass
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_price"], m["n_discounted"])],
        "n_rows bigint, total_price double, n_discounted bigint",
    )


@_q(
    "ps_pandas_on_spark",
    """
    SELECT c_mktsegment, count(*) AS n,
           round((CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                  / count(*)) / 100.0, 3) AS avg_bal,
           round(max(c_acctbal), 2) AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def ps_pandas_on_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-on-Spark (pyspark.pandas) — the drop-in pandas API over
    distributed frames: a groupby().agg() written exactly as pandas
    compiles to the SAME Catalyst hash-aggregate plan as the DataFrame
    form (no collect, no driver materialization at any point; the
    default-index warning cases are avoided by aggregating immediately).
    The result converts back to a Spark DataFrame for the oracle
    comparison. This is the migration surface for pandas-shop teams —
    same engine, same plan, pandas spelling."""
    import pyspark.pandas as ps

    # The mean runs over exact integer CENTS (2dp-quantized balances):
    # every partial sum of integers < 2^53 is exact in float64 regardless
    # of aggregation order, so mean = exact_sum / n is engine- and
    # partitioning-independent — a rounded plain double avg is the
    # repo's documented "quantized avg" parity flake class. The /100
    # descale and the round happen after, mirrored in the oracle.
    cust = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_acctbal",
        dround(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    psdf = cust.pandas_api()
    agg = (
        psdf.groupby("c_mktsegment")
        .agg({"cents": ["count", "mean"], "c_acctbal": ["max"]})
        .reset_index()
    )
    out = agg.to_spark()  # multi-level pandas columns flatten to "(col, fn)"
    return out.select(
        F.col("`(c_mktsegment, )`").alias("c_mktsegment"),
        F.col("`(cents, count)`").cast("long").alias("n"),
        dround(F.col("`(cents, mean)`") / 100.0, 3).alias("avg_bal"),
        dround(F.col("`(c_acctbal, max)`"), 2).alias("max_bal"),
    )


@_q(
    "sink_xml_roundtrip",
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    """,
)
def sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source (Spark 4's built-in XML data source — the last
    text format in the family next to CSV and JSON-lines): nation written
    as <row> elements, read back with an EXPLICIT schema and rowTag.
    Small-dimension-table shaped on purpose: XML is the interchange
    format of record systems (feeds, configs), not a 100 TB scan format —
    at scale it is an INGEST format converted to parquet in one pass,
    which is exactly what this query's write→read→project models."""
    out = tempfile.mkdtemp(prefix="spark_graft_xmlsink_")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    nat.write.format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).mode("overwrite").save(out)
    return (
        spark.read.format("xml")
        .schema("n_nationkey bigint, n_name string, n_regionkey bigint")
        .option("rowTag", "nation")
        .load(out)
    )


# ------------------------------------------------- round-3 surface widening


@_q(
    "agg_mode_median",
    """
    WITH m AS (
      SELECT l_returnflag, l_quantity, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2),
    r AS (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity) AS rk
      FROM m)
    SELECT s.l_returnflag,
           r.l_quantity AS mode_qty,
           round(median(s.l_quantity), 4) AS median_qty,
           round(median(s.l_extendedprice), 4) AS median_price
    FROM lineitem s JOIN r ON s.l_returnflag = r.l_returnflag AND r.rk = 1
    GROUP BY 1, 2
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode + exact median per group. The mode is computed as an explicit
    count-then-rank (deterministic smallest-value tie-break) rather than
    Spark's ``mode()``, whose tie behavior is engine-defined — the ranked
    form is the one whose answer any engine reproduces. Median uses the
    native exact ``median`` aggregate (interpolated at even counts, same
    contract as DuckDB's).

    Scale: the mode path aggregates to (group, value) pairs first — shuffle
    is value-domain-sized, not row-sized — then a per-group top-1 window
    over that tiny aggregate; exact median is a sort-based aggregate per
    group, the one genuinely rank-based cost here (the approx sibling is
    `agg_percentile_approx`)."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity")
    )
    mode = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    med = li.groupBy("l_returnflag").agg(
        dround(F.median("l_quantity"), 4).alias("median_qty"),
        dround(F.median("l_extendedprice"), 4).alias("median_price"),
    )
    return med.join(F.broadcast(mode), "l_returnflag").select(
        "l_returnflag", "mode_qty", "median_qty", "median_price"
    )


@_q(
    "agg_countif_bool",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (o_totalprice > 150000) AS n_big,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_filled,
           max(o_orderdate) AS latest_order
    FROM orders GROUP BY 1
    """,
)
def agg_countif_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate family — ``count_if``, ``bool_and``,
    ``bool_or`` — the data-quality assertion aggregates (every one is a
    partial-aggregable JVM expression; a 100 TB validity sweep is one
    map-side-combined scan)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_filled"),
        F.max("o_orderdate").alias("latest_order"),
    )


@_q(
    "agg_grouping_id",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           count(*) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with ``grouping_id()`` — the bitmask that tells subtotal
    levels apart even when a real value collides with the NULL placeholder
    (the reason grouping_id exists). Spark's bit order (first grouping
    column = most significant) matches the explicit GROUPING()*2+GROUPING()
    encoding on the oracle side."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dround(F.sum("l_quantity"), 2).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "gid",
            "n",
            "qty",
        )
    )


@_q(
    "join_nullaware_anti",
    """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE nullif(c_nationkey, 3) NOT IN
          (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
)
def join_nullaware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a NULLable expression — the null-aware anti join, a
    genuinely distinct physical operator from LeftAnti: a NULL probe key
    matches NOTHING under three-valued logic (those customers vanish from
    the result), and a NULL in the subquery would empty it entirely.
    Catalyst plans the single-column case as a broadcast null-aware anti
    join (NAAJ) rather than a per-row nested-loop.

    Scale: the subquery side is a dimension (broadcastable); NAAJ keeps
    the big side scan-shaped. The semantics are the point — rewriting NOT
    IN to NOT EXISTS changes the answer in the presence of NULLs, so an
    engine must carry both."""
    _view(spark, sf_dir, "customer"), _view(spark, sf_dir, "nation")
    return spark.sql(ORACLES["join_nullaware_anti"])


@_q(
    "mm_resize_stats",
    """
    WITH dims AS (
      SELECT doc_id, (doc_id % 32 + 8) AS w, (doc_id % 24 + 8) AS h
      FROM documents),
    px AS (
      SELECT d.doc_id,
             ((a.i * d.h) // 8 + (b.j * d.w) // 8 + d.doc_id) % 256 AS v
      FROM dims d, range(8) a(i), range(8) b(j)),
    means AS (SELECT doc_id, avg(v) AS m FROM px GROUP BY 1)
    SELECT (doc_id % 7) AS size_class,
           count(*) AS n,
           round(avg(m), 4) AS avg_resized_mean
    FROM means GROUP BY 1
    """,
)
def mm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode → nearest-neighbor resize end-to-end: each doc becomes a
    gradient image (pixel[y][x] = (y + x + doc_id) % 256 on every channel)
    encoded as an actual PPM (even ids) or BMP (odd ids) container, then
    `resize_images` strict-decodes and resamples it to a fixed 8×8
    thumbnail with the integer floor map ``src = dst * src_dim // 8``.
    Because the map is pure integer math, the oracle recomputes every
    sampled pixel from the generating formula — a codec that drops BMP row
    padding, flips the bottom-up row order, or an off-by-one in the
    resample index shifts the sampled gradient values and fails the hash."""
    from collections.abc import Iterator

    import numpy as np

    from ..operators.multimodal import encode_bmp, encode_ppm, resize_images

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 32 + 8).cast("int").alias("w"),
        (F.col("doc_id") % 24 + 8).cast("int").alias("h"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                y = np.arange(int(h), dtype=np.int64)[:, None]
                x = np.arange(int(w), dtype=np.int64)[None, :]
                plane = ((y + x + int(mid)) % 256).astype(np.uint8)
                arr = np.repeat(plane[:, :, None], 3, axis=2)
                blob = encode_ppm(arr) if int(mid) % 2 == 0 else encode_bmp(arr)
                rows.append({"media_id": int(mid), "media": blob})
            yield pd.DataFrame(rows, columns=["media_id", "media"])

    media = docs.mapInPandas(gen, "media_id long, media binary")
    return (
        resize_images(media, out_w=8, out_h=8)
        .withColumn("size_class", F.col("media_id") % 7)
        .groupBy("size_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.avg("resized_mean"), 4).alias("avg_resized_mean"),
        )
    )


@_q(
    "window_count_distinct",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events)
    SELECT user_id, ts, event_id,
           CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS distinct_types_so_far
    FROM flagged
    """,
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — an aggregate Spark (and
    ANSI SQL) forbid directly (`count(distinct) OVER (... ROWS ...)` is
    unsupported), expressed as the standard two-window rewrite: flag each
    (user, type)'s FIRST occurrence with row_number, then running-sum the
    flags. Both windows and the ordering share the user_id hash
    partitioning; the (ts, event_id) tie-break keeps the running value
    deterministic under replay.

    Scale: the explicit repartition on user_id is what makes this ONE
    exchange — HashPartitioning(user_id) satisfies the clustering
    requirement of BOTH windows (a hash on a SUBSET of a window's
    partition keys co-locates its groups; the reverse is false: left to
    itself Catalyst hashes the first window on (user_id, event_type),
    which does NOT satisfy the outer user_id window, inserting a second
    exchange). Plan-pinned in test_plans; the only cost vs one window is
    the in-partition sort."""
    ev = _t(spark, sf_dir, "events").repartition("user_id")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    return (
        ev.withColumn("first_seen", first_seen)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
        )
    )


@_q(
    "source_csv_malformed",
    """
    SELECT count(CASE WHEN c_custkey % 13 <> 0 THEN 1 END) AS n_good,
           count(CASE WHEN c_custkey % 13 = 0 THEN 1 END) AS n_bad,
           round(sum(CASE WHEN c_custkey % 13 <> 0 THEN c_acctbal END), 2)
             AS good_bal
    FROM customer
    """,
)
def source_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling on the CSV scan path (PERMISSIVE mode +
    ``columnNameOfCorruptRecord``) — the ingestion-robustness contract a
    real feed needs: bad rows must neither kill the job (FAILFAST) nor
    vanish silently (DROPMALFORMED default blindness), but land in a
    quarantine column with the raw line preserved for replay.

    The fixture corrupts a deterministic subset (custkey % 13 == 0) with
    a type-unparseable line BEFORE writing, so the oracle knows the
    good/bad split without depending on any CSV parsing semantics. The
    quarantine count and the clean-row aggregate must both match.

    Scale: PERMISSIVE parsing is per-row work inside the scan — no extra
    pass; the corrupt column is projected only when referenced (here) and
    prunes away otherwise. At 100 TB the quarantine rows would stream to
    a dead-letter sink off the same scan."""
    cust = _t(spark, sf_dir, "customer")
    line = F.when(
        F.col("c_custkey") % 13 == 0,
        F.lit("oops,not,an,int,row"),
    ).otherwise(
        F.concat_ws(
            ",",
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("c_nationkey"),
            F.col("c_acctbal"),
            F.col("c_mktsegment"),
        )
    )
    src = tempfile.mkdtemp(prefix="spark_graft_badcsv_")
    cust.select(line.alias("value")).write.mode("overwrite").text(src)
    back = (
        spark.read.schema(
            "c_custkey int, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string, _bad string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(src)
    )
    return back.agg(
        F.count(F.when(F.col("_bad").isNull(), F.lit(1))).alias("n_good"),
        F.count(F.when(F.col("_bad").isNotNull(), F.lit(1))).alias("n_bad"),
        dround(
            F.sum(F.when(F.col("_bad").isNull(), F.col("c_acctbal"))), 2
        ).alias("good_bal"),
    )
