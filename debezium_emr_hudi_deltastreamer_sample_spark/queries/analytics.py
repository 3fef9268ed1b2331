"""Advanced-analytics closure queries: exact-distinct bitmap aggregation,
MATCH_RECOGNIZE-style sequence detection, linear time-series
interpolation, and URL canonicalization/dedup — capability-closure rows
next to the reference's landed-table query surface (reference
README.md:234,273), each with a DuckDB oracle.

Same determinism contract as queries/relational.py: identical aliases in
both engines, rounded doubles, tz-free integer arithmetic where engines
could disagree on timestamp→epoch conversions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table as _t
from ..functions import dround

from ._registry import make_registry

QUERIES, ORACLES, _q = make_registry()


@_q(
    "agg_bitmap_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS distinct_users,
           count(DISTINCT CASE WHEN value > 50 THEN user_id END) AS big_spenders
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap partial aggregation (Spark 3.5+
    `bitmap_*` family) — the scale-safe alternative to a naive
    COUNT(DISTINCT) when the distinct expansion is the bottleneck.

    Why this shape at 100 TB: COUNT(DISTINCT key) expands every group to
    its full key set before the final dedup — the shuffle carries one row
    per (group, key). The bitmap form aggregates each 32 768-key bucket
    into a fixed ≤4 KB bitmap ON THE MAP SIDE, so the shuffle carries
    (group, bucket)-many bitmaps instead of raw keys; the final pass sums
    `bitmap_count`s. Exact (not a sketch — contrast agg_approx_distinct's
    HLL), and the bitmaps OR-merge associatively, so partial aggregation
    stays effective. The conditional variant (distinct big spenders)
    shows the same trick composing with a filter."""
    ev = _t(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm_all"),
        F.bitmap_construct_agg(
            F.bitmap_bit_position(
                F.when(F.col("value") > 50, F.col("user_id"))
            )
        ).alias("bm_big"),
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm_all")).alias("distinct_users"),
        F.sum(F.bitmap_count("bm_big")).alias("big_spenders"),
    )


@_q(
    "window_pattern_match",
    """
    WITH seq AS (
      SELECT user_id, event_id, event_type,
             lead(event_type, 1) OVER w AS e1,
             lead(event_type, 2) OVER w AS e2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           count(*) AS n_matches,
           min(event_id) AS first_match_id
    FROM seq
    WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
    GROUP BY user_id
    """,
)
def window_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern detection (SQL MATCH_RECOGNIZE's simplest
    shape, which Spark lacks natively): per user, find every occurrence
    of three CONSECUTIVE events view → click → purchase in time order.

    Scale: one shuffle (the per-user window partition); the pattern is
    two `lead`s + a filter — row-local once the partition is sorted, no
    join, no state machine UDF. Longer fixed patterns are more leads;
    variable-length patterns (A B* C) need the sessionize-then-
    `applyInPandasWithState` form (see stream_stateful_totals). The
    (ts, event_id) ORDER keeps the sequence deterministic under ties."""
    seq = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    return (
        ev.withColumn("e1", F.lead("event_type", 1).over(seq))
        .withColumn("e2", F.lead("event_type", 2).over(seq))
        .filter(
            (F.col("event_type") == "view")
            & (F.col("e1") == "click")
            & (F.col("e2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("event_id").alias("first_match_id"),
        )
    )


@_q(
    "ts_interpolate",
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
      FROM (SELECT DISTINCT event_type FROM events) t, bounds),
    g AS (
      SELECT grid.event_type, grid.h, v,
             CAST(row_number() OVER
               (PARTITION BY grid.event_type ORDER BY grid.h) AS BIGINT) AS idx
      FROM grid LEFT JOIN b USING (event_type, h)),
    ends AS (
      SELECT event_type, h, v, idx,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
               OVER wp AS pi,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
               OVER wf AS ni
      FROM g
      WINDOW wp AS (PARTITION BY event_type ORDER BY idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY idx
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, CAST(epoch(h) AS BIGINT) AS h,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (idx - pi) / (ni - pi)
           END, 3) AS v_interp,
           v IS NULL AS is_gap
    FROM ends
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation (the hypertable
    `interpolate()` sibling of ts_gap_fill's locf): hourly per-type
    averages on a dense grid, with missing buckets filled by the straight
    line between the nearest observed neighbors (edges clamp to the
    nearest observation).

    Scale: identical cost shape to ts_gap_fill — the raw scan collapses
    to a |types|×|hours| rollup first and everything downstream is
    grid-sized. Interpolation is two mirrored windows (running last /
    following first), each sequential only within one type's timeline.
    The gap fraction uses the dense grid's ROW INDEX, not epoch
    arithmetic — hour positions are integers in both engines, so the
    math is tz-proof and hashes identically."""
    from .extended import _hourly_type_grid

    b, grid = _hourly_type_grid(spark, sf_dir)
    by_h = W.partitionBy("event_type").orderBy("h")
    wp = by_h.rowsBetween(W.unboundedPreceding, 0)
    wf = by_h.rowsBetween(0, W.unboundedFollowing)
    g = grid.join(b, ["event_type", "h"], "left").withColumn(
        "idx", F.row_number().over(by_h).cast("long")
    )
    obs_idx = F.when(F.col("v").isNotNull(), F.col("idx"))
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("idx") - F.col("pi"))
            / (F.col("ni") - F.col("pi"))
        )
    )
    return (
        g.withColumn("pv", F.last("v", ignorenulls=True).over(wp))
        .withColumn("pi", F.last(obs_idx, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wf))
        .withColumn("ni", F.first(obs_idx, ignorenulls=True).over(wf))
        # Epoch seconds, not raw TIMESTAMP (driver-OS-timezone hazard —
        # see ts_gap_fill).
        .select(
            "event_type",
            F.unix_timestamp("h").alias("h"),
            dround(interp, 3).alias("v_interp"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


@_q(
    "pipe_url_normalize",
    """
    WITH urls AS (
      SELECT doc_id,
             'https://CDN' || (doc_id % 7) || '.Example.COM:443/docs/item'
             || (doc_id % 40) || '?session=' || doc_id
             || '&utm_source=feed#frag' AS url
      FROM documents),
    canon AS (
      SELECT doc_id,
             'https://' || lower(regexp_extract(url, 'https://([^/:]+)', 1))
             || regexp_extract(url, ':443(/[^?#]*)', 1) AS canonical_url
      FROM urls)
    SELECT canonical_url,
           count(*) AS n_docs,
           min(doc_id) AS keeper_doc
    FROM canon
    GROUP BY canonical_url
    HAVING count(*) > 1
    """,
)
def pipe_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + duplicate grouping — the web-crawl dedup
    pre-pass (strip tracking params and fragments, lowercase the host,
    drop the default port) that runs BEFORE content dedup in a CommonCrawl
    -style pipeline. Corpus URLs are synthesized deterministically from
    doc_id since the fixture has no URL column (mixed-case host, default
    port, per-visit session + utm params, fragment); both engines build
    the identical string, and canonicalization must collapse the
    per-visit noise down to scheme+host+path.

    Scale: `parse_url` is a JVM intrinsic — the whole normalize is one
    codegen'd projection, no Python, no shuffle until the canonical-url
    groupBy (which shuffles short canonical strings, not documents). At
    crawl scale the groupBy key should be `xxhash64(canonical_url)` with
    the string kept as a payload — same plan shape. The keeper rule
    (min doc_id) makes the dedup decision deterministic."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("https://CDN"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM:443/docs/item"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("?session="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_source=feed#frag"),
    )
    with_url = docs.withColumn("url", url)
    canonical = F.concat(
        F.lit("https://"),
        F.lower(F.parse_url("url", F.lit("HOST"))),
        F.parse_url("url", F.lit("PATH")),
    )
    return (
        with_url.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


@_q(
    "agg_regression",
    """
    SELECT l_returnflag,
           regr_count(l_extendedprice, l_quantity) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 1) AS intercept,
           round(regr_avgx(l_extendedprice, l_quantity), 3) AS avg_qty,
           round(regr_avgy(l_extendedprice, l_quantity), 2) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed least-squares via the SQL:2003 `regr_*` aggregate family
    (Spark 3.5+/DuckDB both implement it): per-group slope/intercept of
    price on quantity — the closed-form OLS fit as a single-pass
    aggregate, no ML library and no iteration.

    Scale: regr_* aggregates are co-moment accumulators (n, Σx, Σy, Σxy,
    Σx², …) — associative, so Spark partial-aggregates them map-side and
    the shuffle carries one fixed-width state per group, like
    agg_corr_covar. This is THE pattern for distributed model fitting
    when the model has a closed form: at 100 TB the fit costs exactly one
    scan. r² is intentionally omitted from the compare (a ratio of two
    near-zero co-moments — ULP-unstable across engines); slope/intercept/
    means are rounded at stable magnitudes."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        dround(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        dround(F.regr_intercept("l_extendedprice", "l_quantity"), 1).alias(
            "intercept"
        ),
        dround(F.regr_avgx("l_extendedprice", "l_quantity"), 3).alias("avg_qty"),
        dround(F.regr_avgy("l_extendedprice", "l_quantity"), 2).alias("avg_price"),
    )


@_q(
    "sql_parameterized",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o_totalprice > 1000.0
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named-parameter binding plus
    DataFrame template interpolation) — the injection-safe way to run
    user-supplied constants through spark.sql, closing the SQL-entrypoint
    row of the API surface next to the DataFrame-built queries.

    Scale: parameters bind as literals BEFORE analysis, so Catalyst
    constant-folds them and the date/price predicates push down to the
    parquet scan exactly as hand-inlined literals would — no plan-cache
    poisoning, no string concatenation. The {orders} template binds the
    catalog-normalized DataFrame (nanos-timestamp handling intact), not a
    raw table name."""
    od = _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM {orders}
        WHERE o_orderdate >= :lo AND o_totalprice > :minp
        GROUP BY o_orderpriority
        """,
        args={"lo": "1999-01-01 00:00:00", "minp": 1000.0},
        orders=od,
    )


@_q(
    "udf_pandas_udaf",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
             AS wavg_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via a GROUPED_AGG pandas UDF (series→scalar) — the
    remaining Arrow-UDF lane next to applyInPandas (grouped map),
    mapInPandas (map iterator) and mapInArrow: a quantity-weighted mean
    price per return flag, computed by a vectorized numpy kernel.

    Scale: GROUPED_AGG ships each WHOLE group to one python worker as
    Arrow batches — no partial aggregation, unlike built-in aggregates.
    That is the honest cost of this lane: right for moderate group counts
    with heavy per-group math; for a plain weighted mean the built-in
    `sum(x*w)/sum(w)` (partial-agg'd, JVM-only) is strictly better, and
    the oracle is exactly that form — this entry pins that the UDAF lane
    produces the built-in lane's numbers. Group sums use numpy float64
    over the full group vector, matching the dround tolerance contract
    the rest of the surface uses."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType is passed explicitly: this module uses postponed
    # annotations (PEP 563), which turn type hints into strings and break
    # pandas_udf's signature-based GROUPED_AGG inference.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wsum(v):
        return float(v.to_numpy().sum())

    # Spark refuses to mix GROUPED_AGG UDFs with built-in aggregates in
    # one agg() — the row count is a pandas aggregate too.
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def pcount(v):
        return len(v)

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice") * F.col("l_quantity")).alias("pw"),
        "l_quantity",
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            (wsum(F.col("pw")) / wsum(F.col("l_quantity"))).alias("wavg_raw"),
            pcount(F.col("l_quantity")).alias("n"),
        )
        .select(
            "l_returnflag",
            dround(F.col("wavg_raw"), 2).alias("wavg_price"),
            "n",
        )
    )


@_q(
    "udf_grouped_arrow",
    """
    SELECT lang,
           count(*) AS n,
           max(n_chars) AS max_chars,
           round(sum(n_chars) * 1.0 / count(*), 3) AS mean_chars
    FROM documents
    GROUP BY lang
    """,
)
def udf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map over RAW ARROW TABLES via Spark 4's
    ``GroupedData.applyInArrow`` — the zero-pandas sibling of
    applyInPandas (no Series construction, no index, no dtype coercion;
    the kernel sees the group's columnar buffers directly), completing
    the Arrow-UDF matrix: mapInPandas / applyInPandas / mapInArrow /
    GROUPED_AGG pandas / applyInArrow.

    The kernel emits only EXACT integers (count, int sum, max) — derived
    doubles are computed by codegen'd expressions afterwards, so no
    float formed inside Python can diverge from the oracle's arithmetic.

    Scale: one shuffle on the group key; each group streams through the
    worker as Arrow batches. Same honest caveat as every grouped-map:
    no partial aggregation — for aggregates this simple the built-in
    hash aggregate wins; the lane exists for per-group logic Catalyst
    cannot express."""
    import pyarrow as pa

    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")

    def stats(table: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        chars = table.column("n_chars")
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n": pa.array([table.num_rows], pa.int64()),
                "sum_chars": pa.array([pc.sum(chars).as_py()], pa.int64()),
                "max_chars": pa.array([pc.max(chars).as_py()], pa.int64()),
            }
        )

    grouped = docs.groupBy("lang").applyInArrow(
        stats, schema="lang string, n long, sum_chars long, max_chars long"
    )
    return grouped.select(
        "lang",
        "n",
        "max_chars",
        dround(F.col("sum_chars") / F.col("n"), 3).alias("mean_chars"),
    )
