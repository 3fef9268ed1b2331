"""Relational query surface (SURVEY.md §2.C) with DuckDB oracle pairs.

The reference lands CDC data into queryable tables (README.md:234, 273) but
contains no queries; this module is the capability closure — projection,
filters, joins of every shape, aggregation, windows, sorts/top-k, set ops,
and the scalar-function slice — each as an idiomatic DataFrame program plus
an equivalent ANSI-SQL oracle.

Determinism rules (driver hashes values order-insensitively):
- Every computed column is aliased identically in Spark and SQL.
- Double aggregates are rounded (2dp money, 4dp ratios) — Spark's partial
  aggregation order differs from DuckDB's, so raw doubles differ in ULPs.
- Top-k queries always carry a unique tie-break key.
- Timestamps are projected as dates or epoch integers, never raw ts.

Scale notes are inline per query: what shuffles, what broadcasts, what
prunes. All joins here let Catalyst/AQE pick broadcast vs sort-merge;
explicit `F.broadcast` hints mark dimension tables that must never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table as _t
from ..functions import dround

from ._registry import make_registry

QUERIES, ORACLES, _q = make_registry()


# ---------------------------------------------------------------------------
# M0 core: scan / project / filter / cast / sort / limit / set ops
# ---------------------------------------------------------------------------


@_q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary.

    Scale: single hash aggregate over the fact table — partial (map-side)
    + final agg for free from Catalyst; the only shuffle is 6 grouping
    cells wide. Filter pushes down to the parquet scan.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(F.sum(disc_price), 2).alias("sum_disc_price"),
            dround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            dround(F.avg("l_quantity"), 4).alias("avg_qty"),
            dround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "filter_predicates",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
           round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderstatus <> 'P'
      AND (o_orderpriority LIKE '1-%' OR o_custkey % 2 = 0)
      AND o_custkey IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, IN, BETWEEN, LIKE, IS NOT NULL
    (SURVEY.md §2.C projection/filter; reference analogue README.md:195).
    All of these reach the parquet scan as PushedFilters."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000, 200000)
        & (F.col("o_orderstatus") != "P")
        & (F.col("o_orderpriority").like("1-%") | (F.col("o_custkey") % 2 == 0))
        & F.col("o_custkey").isNotNull()
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        dround("o_totalprice", 2).alias("total"),
    )


@_q(
    "project_cast_drop",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_quantity) AS INTEGER) AS qty_int,
           CAST(l_shipdate AS DATE)          AS ship_date,
           CAST(l_orderkey AS VARCHAR)       AS orderkey_str,
           round(l_extendedprice * (1 - l_discount), 2) AS net_price
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def project_cast_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast projection + column drop (reference A2/A8, README.md:195, 185)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") <= 2)
        # floor() on BOTH sides: Spark's double->int cast truncates while
        # DuckDB's rounds to nearest — explicit floor pins one semantic
        # (latent until a fixture carries fractional quantities).
        .withColumn("qty_int", F.floor("l_quantity").cast("int"))
        .withColumn("ship_date", F.col("l_shipdate").cast("date"))
        .withColumn("orderkey_str", F.col("l_orderkey").cast("string"))
        .withColumn(
            "net_price", dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
        )
        .drop(
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
    )


@_q(
    "top_orders_global",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: Spark plans TakeOrderedAndProject — no full sort, each
    partition keeps K then the driver merges. Tie-break on o_orderkey for
    determinism."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", dround("o_totalprice", 2).alias("total"))
        .limit(25)
    )


@_q(
    "distinct_flags",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`distinct` = groupBy-all shuffle; AQE coalesces the tiny result."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@_q(
    "set_ops_nations",
    """
    WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT 'union' AS op, nk FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)
    UNION ALL
    SELECT 'intersect' AS op, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
    UNION ALL
    SELECT 'except' AS op, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
    """,
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except (SURVEY.md §2.C set ops; B11 analogue)."""
    cn = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    return (
        cn.union(sn).distinct().select(F.lit("union").alias("op"), "nk")
        .unionByName(cn.intersect(sn).select(F.lit("intersect").alias("op"), "nk"))
        .unionByName(cn.subtract(sn).select(F.lit("except").alias("op"), "nk"))
    )


# ---------------------------------------------------------------------------
# Joins — every shape (SURVEY.md §2.C joins)
# ---------------------------------------------------------------------------


@_q(
    "join_star_revenue",
    """
    SELECT n_name, r_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name, r_name
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ orders (shuffle on orderkey at 100 TB — the one
    unavoidable big shuffle), then dims broadcast (customer/nation/region
    are orders-of-magnitude smaller; the hint pins the strategy so a stale
    size estimate can't demote them to sort-merge)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_q(
    "join_left_outer",
    """
    SELECT c_custkey, c_name,
           count(o_orderkey)                    AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@_q(
    "join_right_outer",
    """
    SELECT n_name,
           count(s_suppkey) AS n_suppliers,
           round(coalesce(sum(s_acctbal), 0), 2) AS total_bal
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join preserving nations with zero suppliers (§2.C joins:
    the right-outer member; Catalyst plans it as the mirrored left-outer,
    broadcast-able on the small preserved side)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            dround(F.coalesce(F.sum("s_acctbal"), F.lit(0.0)), 2).alias("total_bal"),
        )
    )


@_q(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi ≡ EXISTS — no row duplication, right side only probed."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@_q(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti ≡ NOT EXISTS — the delete-application primitive (reference
    B8: Debezium op='d' rows removed from the table, README.md:260, 348)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@_q(
    "join_full_outer",
    """
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nk,
           coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full_outer").select(
        F.coalesce(c.nk, s.nk).alias("nk"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@_q(
    "join_theta_range",
    """
    SELECT p_brand,
           count(*) AS n_matches,
           round(avg(l_quantity), 4) AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
                 AND l_quantity BETWEEN p_size - 2 AND p_size + 2
    GROUP BY p_brand
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: the equi key keeps it hash-joinable; the
    range predicate is evaluated post-probe. A pure theta join would be a
    broadcast-nested-loop — avoided at scale by always anchoring on an
    equi key when one exists."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size - 2)
        & (li.l_quantity <= p.p_size + 2)
    )
    return (
        li.join(F.broadcast(p), cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            dround(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


@_q(
    "join_cross_small",
    """
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (dims only — never the fact table)."""
    r1 = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(r2).filter(F.col("k1") < F.col("k2")).select("from_region", "to_region")
    )


@_q(
    "shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter broadcast into the fact join,
    then top-K on the aggregate (global sort avoided via limit)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.C aggregations)
# ---------------------------------------------------------------------------


@_q(
    "agg_stats_events",
    """
    SELECT event_type,
           count(*)                        AS n,
           round(sum(value), 2)            AS sum_value,
           round(avg(value), 4)            AS avg_value,
           round(min(value), 2)            AS min_value,
           round(max(value), 2)            AS max_value,
           round(stddev_samp(value), 4)    AS sd_value,
           count(DISTINCT user_id)         AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("value"), 2).alias("sum_value"),
        dround(F.avg("value"), 4).alias("avg_value"),
        dround(F.min("value"), 2).alias("min_value"),
        dround(F.max("value"), 2).alias("max_value"),
        dround(F.stddev_samp("value"), 4).alias("sd_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@_q(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dround(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@_q(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus) AS g_status, grouping(o_orderpriority) AS g_prio,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("o_totalprice"), 2).alias("total"),
    )


@_q(
    "agg_percentiles",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(corr(o_totalprice, o_custkey), 4)     AS price_cust_corr,
           round(var_samp(o_totalprice), 2)            AS var_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`), correlation, sample variance."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        dround(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        dround(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        dround(F.corr("o_totalprice", "o_custkey"), 4).alias("price_cust_corr"),
        dround(F.var_samp("o_totalprice"), 2).alias("var_price"),
    )


@_q("agg_approx_distinct")  # HLL sketch — no SQL oracle (rows-only check)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the scale path for
    count-distinct — no exact-distinct shuffle, sketches merge
    associatively. Accuracy asserted vs exact counts in tests/.

    Shape note: the approx and exact counts are computed over an explicit
    (flag, orderkey) dedup, NOT one combined agg — combining a distinct
    aggregate with approx_count_distinct triggers Catalyst's distinct
    rewrite, which plants the HLL++ partial BELOW the per-key dedup
    aggregate: one rsd=0.01 sketch buffer (1638 longs ≈ 13 KB, plan shows
    Results [1641]) per DISTINCT (flag, orderkey) group — gigabytes of
    aggregation buffer and shuffle for a 3-row result (measured 19.3 s at
    sf0.1; this form 1.7 s, values bit-identical). HLL is duplicate-
    insensitive, so sketching the deduped keys yields the identical
    estimate, and count(key) over the dedup IS the exact distinct count.
    One scan, sketch buffers only at the 3 final groups."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
            F.count("l_orderkey").alias("exact_orders"),
        )
    )


@_q(
    "agg_collect_pivot",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_collect_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit list avoids the extra
    distinct-values job Spark otherwise runs)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dround(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
        )
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY.md §2.C windows; B5/B6 core primitive)
# ---------------------------------------------------------------------------


@_q(
    "window_topk_per_group",
    """
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS total, rn
    FROM (SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group = row_number + filter — the same window-dedup shape
    as the upsert precombine (reference B5/B6, README.md:305-306). One
    shuffle on the partition key; no global sort."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            dround("o_totalprice", 2).alias("total"),
            "rn",
        )
    )


@_q(
    "window_lag_lead",
    """
    SELECT user_id, event_id, event_type,
           round(value, 2) AS value,
           round(lag(value)  OVER w, 2) AS prev_value,
           round(lead(value) OVER w, 2) AS next_value,
           round(value - coalesce(lag(value) OVER w, value), 2) AS delta
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        dround("value", 2).alias("value"),
        dround(F.lag("value").over(w), 2).alias("prev_value"),
        dround(F.lead("value").over(w), 2).alias("next_value"),
        dround(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value")), 2
        ).alias("delta"),
    )


@_q(
    "window_running_frames",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           round(first_value(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 2) AS first_total
    FROM orders
    """,
)
def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/sliding frames: rowsBetween running sum, 3-row moving avg,
    first_value — all in one shuffle on o_custkey."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        dround(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_spend"),
        dround(F.avg("o_totalprice").over(w.rowsBetween(-2, W.currentRow)), 4).alias(
            "moving_avg3"
        ),
        dround(F.first("o_totalprice").over(w), 2).alias("first_total"),
    )


@_q(
    "window_rank_ntile",
    """
    SELECT c_custkey, c_nationkey,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment)              AS seg_dense,
           ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile
    FROM customer
    """,
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    wn = W.partitionBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(wn.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))).alias(
            "bal_rank"
        ),
        F.dense_rank().over(wn.orderBy("c_mktsegment")).alias("seg_dense"),
        # Partitioned ntile: a global ORDER BY window is a one-partition
        # bottleneck at scale (WindowExec warns); per-nation quartiles
        # exercise the same operator shuffle-safely.
        F.ntile(4)
        .over(wn.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")))
        .alias("bal_quartile"),
    )


# ---------------------------------------------------------------------------
# Scalar function slice (SURVEY.md §2.C scalar functions)
# ---------------------------------------------------------------------------


@_q(
    "scalar_strings",
    """
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           lower(c_mktsegment)                             AS seg_lower,
           substring(c_name, 1, 8)                         AS name_prefix,
           length(c_name)                                  AS name_len,
           concat(c_name, ':', c_mktsegment)               AS name_seg,
           trim(concat(' ', c_name, ' '))                  AS name_trim,
           regexp_extract(c_name, '([0-9]+)', 1)           AS name_digits,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_devoweled,
           replace(c_mktsegment, 'A', '@')                 AS seg_replaced
    FROM customer WHERE c_custkey <= 500
    """,
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat("c_name", F.lit(":"), "c_mktsegment").alias("name_seg"),
        F.trim(F.concat(F.lit(" "), "c_name", F.lit(" "))).alias("name_trim"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("seg_devoweled"),
        F.replace("c_mktsegment", F.lit("A"), F.lit("@")).alias("seg_replaced"),
    )


@_q(
    "scalar_dates",
    """
    SELECT o_orderkey,
           year(o_orderdate)                                    AS order_year,
           month(o_orderdate)                                   AS order_month,
           day(o_orderdate)                                     AS order_day,
           CAST(date_trunc('month', o_orderdate) AS DATE)       AS month_start,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT)                   AS epoch_sec
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time slice. Note arg-order traps: Spark datediff(end, start) ≡
    DuckDB date_diff('day', start, end)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), "o_orderdate").alias(
            "days_to_y2k"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


@_q(
    "scalar_math_cond",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 50000), 2)       AS dist_from_50k,
           round(pow(l_quantity, 2), 2)                 AS qty_sq,
           round(ln(l_extendedprice), 4)                AS ln_price,
           round(sqrt(l_quantity), 4)                   AS sqrt_qty,
           CASE WHEN l_discount > 0.05 THEN 'high'
                WHEN l_discount > 0.02 THEN 'mid'
                ELSE 'low' END                          AS disc_band,
           coalesce(nullif(l_tax, 0.0), -1.0)           AS tax_or_flag,
           CAST(floor(l_quantity / 10) AS BIGINT)       AS qty_decile,
           greatest(l_discount, l_tax)                  AS max_rate
    FROM lineitem WHERE l_orderkey <= 5000
    """,
)
def scalar_math_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 5000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.abs(F.col("l_extendedprice") - 50000), 2).alias("dist_from_50k"),
        dround(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        dround(F.log("l_extendedprice"), 4).alias("ln_price"),
        dround(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.02, "mid")
        .otherwise("low")
        .alias("disc_band"),
        F.coalesce(F.nullif("l_tax", F.lit(0.0)), F.lit(-1.0)).alias("tax_or_flag"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
    )


@_q(
    "scalar_json",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
                THEN 'hi' ELSE 'lo' END AS k_band
    FROM events WHERE event_id <= 2000
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction — the reference's core parse operation (from_json on
    the Debezium envelope, README.md:182, 323). Here: typed schema parse
    via from_json, not per-row get_json_object, so Catalyst can prune."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    parsed = ev.withColumn("j", F.from_json("props", "struct<k:int>"))
    return parsed.select(
        "event_id",
        "event_type",
        F.col("j.k").alias("prop_k"),
        F.when(F.col("j.k") >= 50, "hi").otherwise("lo").alias("k_band"),
    )


@_q("agg_percentile_approx")  # quantile sketch — rows-only (tests pin error)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna-style quantile sketch):
    the one-pass, mergeable, bounded-memory path for quantiles at 100 TB
    (exact `percentile` buffers each group's values). Default accuracy
    (1e4): rank error ≤ 1/accuracy; tests assert the estimates sit within
    0.5% of the exact interpolated values on the fixture."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5)).alias("p50_est"),
        F.percentile_approx("o_totalprice", F.lit(0.9)).alias("p90_est"),
        F.count(F.lit(1)).alias("n"),
    )


@_q(
    "forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the canonical scan-dominated query: three pushed
    predicates, two read columns beyond them, one global partial-agg'd
    sum. The whole plan is a single codegen'd scan stage; at 100 TB its
    cost is parquet I/O minus row-group skipping on l_shipdate (the
    clustered-sink layout sink_clustered_readback grades makes that
    skipping real)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        dround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
