"""Classic TPC-H-shaped analytics (adapted to the driver's trimmed
schemas) — the decision-support workloads a user of the reference's landed
tables (reference README.md:234,273 — "query the Hudi table with Spark
SQL / Athena") would actually run. Each is the canonical plan-shape
challenge the optimizer literature names it for:

- Q7  two-sided nation-pair volume: same dimension joined twice under an
  OR-pair residual — tests join reordering + broadcast of both copies.
- Q8  market share: conditional aggregation over a 6-table star.
- Q10 returned-item revenue: selective fact filter before a wide join.
- Q14 promo effect: two conditional sums in one pass (no self-join).
- Q15 top supplier: aggregate → scalar-subquery max → equality join.
- Q18 large orders: HAVING-filtered aggregate semi-joined back to facts.
- Q19 bracket revenue: disjunctive multi-column predicates (OR of ANDs).
- Q22 idle customers: anti join + uncorrelated scalar subquery.
- Q4  priority check (round 5): EXISTS with a cross-relation date
  residual — a LEFT SEMI whose join condition is key + non-equi.
- Q5  local supplier volume (round 5): THE join-ordering benchmark;
  same-nation constraint binds both FK chains.
- Q13 order distribution (round 5): filtered OUTER join (predicate in
  the join condition) + double-aggregation histogram.
- Q17 small-quantity revenue (round 5): correlated scalar avg subquery
  decorrelated into a pre-aggregated join, exact-integer predicate.
- Q21 waiting supplier (round 5): EXISTS + NOT EXISTS over the same
  fact, as the per-order rollup rewrite (single fact materialization).
- Q2  min-cost supplier (round 6): correlated-min scalar subquery
  decorrelated into a per-part min equality join; deterministic LIMIT.
- Q11 important parts (round 6): grouped aggregate filtered by an
  uncorrelated scalar subquery over itself, exact-decimal threshold.
- Q12 late priority lines (round 6): conditional two-way counts under a
  cross-relation date residual that cannot push below the join.
- Q16 supplier/part counts (round 6): DISTINCT-pair source + NOT IN
  exclusion + count(DISTINCT) over a multi-attribute group.
- Q20 promotable suppliers (round 6): double-nested IN with a grouped
  HAVING in the middle subquery, decorrelated to two semi joins.

With these the adapted decision-support family covers all 22 TPC-H
shapes (Q1 = pricing_summary, Q3 = shipping_priority, Q6 =
filter_predicates' scan-bound sibling live in queries/relational.py).

The reference repo has no query surface of its own (47 LoC generator,
README-embedded config); these close SURVEY.md §2.C's "joins of every
shape / aggregation" row with industry-standard shapes whose 100 TB
behavior is well understood: every dimension that must broadcast is
hinted, every fact-side filter is pushdown-checked in tests/test_plans.py.

Determinism: computed columns aliased identically in Spark and DuckDB,
doubles rounded, every ORDER-free result relies on the driver's
order-insensitive hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as _t
from ..functions import dround

from ._registry import make_registry

QUERIES, ORACLES, _q = make_registry()


@_q(
    "tpch_q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
            OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations per ship year. The same `nation` dimension participates twice
    (supplier side and customer side) with an OR over the pair assignment.

    Scale: both nation copies and supplier broadcast (25 / 100·SF rows);
    customer⋈orders⋈lineitem is the only real shuffle chain and AQE picks
    broadcast for customer at small SF. The nation-pair predicate cannot
    prune the fact scan, but the shipdate range does (PushedFilters); the
    OR-pair residual is evaluated post-join on already-tiny rows. Group
    space is 2 nations × 2 years — the final agg is map-side dominated."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = na.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (
        F.col("cust_nation") == "NATION_9"
    ) | (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one supplier nation's share of
    PROMO-part revenue sold into ASIA customers, per order year —
    conditional aggregation over a 7-join star (nation twice again).

    Scale: part is filtered to one p_type BEFORE joining, so the
    fact⋈part join is the selective one — placing it first shrinks
    everything downstream (Catalyst reorders; the broadcast hint makes the
    filtered part side a map-side join, no fact shuffle for it). The
    share is two conditional sums in ONE aggregate — never two scans or a
    self-join. Region/nation/supplier all broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    od = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = na.join(
        F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nkey"))
    supp_nation = na.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dround(
                F.sum(F.when(F.col("nation") == "NATION_2", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@_q(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate BETWEEN TIMESTAMP '1996-10-01 00:00:00'
                          AND TIMESTAMP '1996-12-31 00:00:00'
    GROUP BY c_custkey, c_name, acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): customers who returned the
    most revenue in one quarter, top 20.

    Scale: BOTH fact-side filters (returnflag on lineitem, date range on
    orders) push to their scans before any join — the join input is a
    quarter of 'R' lines, not the table. The aggregate keys on customer
    (pre-shuffled by the join), and the top-20 is a global
    TakeOrderedAndProject — no full sort. Tie-break on c_custkey keeps
    the limit deterministic."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    od = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-10-01", "1996-12-31")
    ).select("o_orderkey", "o_custkey")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name", dround(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_q(
    "tpch_q14_promo_effect",
    """
    SELECT month,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM (
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
               l_extendedprice, l_discount, p_type
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
    )
    GROUP BY month
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), widened to a per-month series: the
    share of revenue from PROMO-type parts over 1996.

    Scale: one pass — the promo share is two conditional sums in a single
    aggregate (the naive form is two scans or a self-join). part joins
    broadcast (it's a dimension); the date filter pushes to the lineitem
    scan. 12 output groups → the shuffle is map-side partials only."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
    )
    pa = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("month"))
        .agg(
            dround(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@_q(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                 AS rev_exact
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1996-03-31 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           round(CAST(rev_exact AS DOUBLE), 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_exact = (SELECT max(rev_exact) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue in
    a quarter — aggregate, scalar-subquery max over the aggregate, then
    an equality filter and a dimension join.

    Scale: the revenue CTE is ONE fact aggregate keyed by suppkey; the
    max is over supplier-count rows (tiny) and comes back as a broadcast
    scalar; the final join touches only max-revenue suppliers. The CTE is
    localCheckpointed so the two consumers (max + join) don't recompute
    the fact scan — at 100 TB a re-scan is the difference between one
    pass and two.

    Determinism: the winner is selected by EQUALITY on the aggregate, so
    the aggregate must be exact, not a rounded double — per-row products
    (bit-identical doubles in both engines) cast to DECIMAL(18,6) and sum
    without order sensitivity, making the max-equality selection
    ULP-proof; only the displayed total casts back to double."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1996-03-31")
    )
    rev_term = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev_term).alias("rev_exact"))
        .localCheckpoint(eager=False)
    )
    max_rev = revenue.agg(F.max("rev_exact").alias("m"))
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("rev_exact") == F.col("m"))
        .join(F.broadcast(su), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            dround(F.col("rev_exact").cast("double"), 2).alias("total_revenue"),
        )
    )


@_q(
    "tpch_q18_large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 180
    )
    GROUP BY c_custkey, c_name, o_orderkey, orderdate, totalprice
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, with their customers — a HAVING-filtered
    aggregate used as a semi-join filter on the same fact table.

    Scale: the qualifying-order set is an aggregate of (orderkey, sum) —
    orders-count sized, HAVING-filtered to a sliver — then LEFT SEMI
    joined back, so the big fact⋈fact never materializes a wide row. At
    100 TB the semi side is small enough that AQE converts it to a
    broadcast semi-join; the final agg reuses the orderkey partitioning
    from the semi-join shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_okey"), "left_semi")
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            dround(F.col("o_totalprice"), 2).alias("totalprice"),
        )
        .agg(dround(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@_q(
    "tpch_q19_bracket_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#9' AND p_size BETWEEN 25 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): revenue matching any of three
    brand/size/quantity brackets — the canonical disjunction-of-
    conjunctions predicate that defeats naive pushdown.

    Scale: the part-only conjuncts (brand, size) CAN prune the part side
    before the join — the union of the three brand terms is applied to
    part pre-join, shrinking the broadcast; the mixed terms evaluate as
    the join residual. One aggregate row out; no shuffle beyond the
    map-side partials."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    pa = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#5", "Brand#9")
    ).select("p_partkey", "p_brand", "p_size")
    bracket = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
        | (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
        | (F.col("p_brand") == "Brand#9")
        & F.col("p_size").between(25, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "tpch_q22_idle_customers",
    """
    WITH c AS (
        SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ),
    s AS (
        SELECT sum(cents) AS total_cents, count(*) AS cnt
        FROM c WHERE cents > 0
    ),
    rich AS (
        SELECT c.* FROM c, s WHERE cents * cnt > total_cents
    )
    SELECT c_mktsegment,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM rich
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), segment-adapted: customers
    with above-average positive balances and no RECENT order (none since
    2000), counted per market segment — uncorrelated scalar subquery +
    anti join.

    Determinism: the membership threshold is NOT a raw float average —
    a double avg differs by ULPs between engines (summation order), so a
    boundary customer could flip. Balances are 2dp-quantized, so the
    compare runs in exact integer cents: ``cents·cnt > total_cents`` is
    precisely ``c_acctbal > avg(positive balances)`` with no division and
    no float (cents ≤ 1e6, count ≤ ~1e10 at sf100k → product ≤ 1e16,
    far under int64). Same rewrite discipline as Q11/Q15/Q17.

    Scale: the (total, count) pair is one broadcast scalar row; the NOT
    EXISTS is a LEFT ANTI join against just the DISTINCT o_custkey
    projection of date-filtered orders — the filter pushes to the orders
    scan and the projection collapses to its key set before shuffling; at
    real scale AQE broadcasts the filtered customer side. Never a
    row-per-order probe."""
    cu = _t(spark, sf_dir, "customer").withColumn(
        "cents", dround(F.col("c_acctbal") * 100, 0).cast("long")
    )
    stats = cu.filter(F.col("cents") > 0).agg(
        F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("cnt")
    )
    buyers = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("buyer_key"))
        .distinct()
    )
    return (
        cu.join(F.broadcast(stats))
        .filter(F.col("cents") * F.col("cnt") > F.col("total_cents"))
        .join(buyers, F.col("c_custkey") == F.col("buyer_key"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@_q(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) — THE join-ordering benchmark
    query: revenue per nation where the customer and the supplier share a
    nation, for one region and one order year. Six tables, two selective
    dimension filters (region name, order-date year), and the same-nation
    constraint that binds the two fact-side FK chains together.

    Scale: region→nation prunes to the 5-nation ASIA branch and both
    broadcast; supplier broadcasts (100·SF rows); the real work is
    orders⋈lineitem after the pushed o_orderdate range cuts the orders
    side ~6× (PushedFilters — pinned in test_plans). The same-nation
    equality rides the supplier join as a second key, never a post-join
    filter over a nation × nation blow-up."""
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    return (
        od.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(su),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): how many customers
    placed 0, 1, 2, … qualifying orders — the double-aggregation histogram
    over a FILTERED outer join (the filter lives in the JOIN CONDITION:
    an urgent-only customer must still appear with count 0, which a WHERE
    would silently delete along with the never-ordered customers).
    count(o_orderkey) counts only matched rows — the outer-join null row
    contributes 0, not 1 (the classic count(*) -vs- count(col) trap).

    Scale: one customer⋈orders shuffle on custkey; the first aggregate is
    co-partitioned with the join output (no extra exchange), the second
    groups a histogram whose key space is the max order count (~tens) —
    map-side partials collapse it."""
    cu = _t(spark, sf_dir, "customer").select("c_custkey")
    od = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cu.join(
            od,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "tpch_q17_small_qty_revenue",
    # Oracle = the CANONICAL correlated scalar subqueries, not the
    # implementation's pre-aggregated join — DuckDB must grade the
    # decorrelation, not replay it. The predicate keeps the exact-integer
    # algebraic form on both sides (5·qty·count < sum ≡ qty < 0.2·avg)
    # so no float boundary can flip between engines.
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND 5 * l_quantity *
            (SELECT count(*) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
          < (SELECT sum(l2.l_quantity) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost if orders
    below 20% of a part's average quantity were not filled — the textbook
    CORRELATED SCALAR SUBQUERY (per-part avg) decorrelated into a
    pre-aggregated join, the rewrite every optimizer paper demonstrates.

    Cross-engine float safety: the 20%-of-average predicate is evaluated
    in EXACT integer arithmetic — ``5·quantity·count < sum`` is algebraic
    for l_quantity < 0.2·avg, and quantities are integral doubles whose
    sums stay exact in float64 — so no boundary row can flip between
    Spark and DuckDB (a direct ``< 0.2*avg(...)`` comparison can, when a
    part's average lands exactly on a multiple of 5).

    Scale: the per-part aggregate is a map-side-partial groupBy of the
    fact table on its own join key (co-partitioned with the subsequent
    join — one shuffle serves both); the brand filter prunes `part` to
    ~1/25 and broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("qsum"), F.count(F.lit(1)).alias("qcnt")
    )
    pt = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4").select(
        "p_partkey"
    )
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(5 * F.col("l_quantity") * F.col("qcnt") < F.col("qsum"))
        .agg(dround(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@_q(
    "tpch_q21_waiting_supplier",
    # The oracle is the CANONICAL correlated form (EXISTS + NOT EXISTS),
    # deliberately NOT the implementation's rollup rewrite: an oracle
    # that restates the rewrite would stay green if the decorrelation
    # itself regressed (e.g. n_late = 1 drifting to >= 1) — this way
    # DuckDB grades the rewrite against the textbook semantics. DISTINCT
    # pins the (order, supplier) grain the rollup produces (a supplier
    # with two late lines in one order counts once).
    """
    WITH q AS (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lineitem l1 JOIN orders o1 ON o1.o_orderkey = l1.l_orderkey
      WHERE o1.o_orderstatus = 'F'
        AND l1.l_shipdate > o1.o_orderdate + INTERVAL 60 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY))
    SELECT s_name, count(*) AS numwait
    FROM q
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) — the hardest
    decorrelation in the benchmark: the classic form is an EXISTS plus a
    NOT EXISTS over the SAME fact table, correlated on the order key with
    a supplier inequality ("some other supplier is on the order" / "no
    other supplier was late"). Adapted lateness: shipped > 60 days after
    the order date (the trimmed schema carries no commit/receipt dates).

    Implemented as the aggregate rewrite both Spark and modern optimizers
    target instead of the double-correlated scan: roll lineitem up to
    (order, supplier, any_late) grain, roll that to per-order
    (supplier-count, late-supplier-count), and the two EXISTS become
    ``n_supp >= 2 AND n_late = 1`` on a single joined row — three
    aggregations, zero correlated subplans, one pass over the fact.

    Scale: the (order, supplier) rollup is materialized ONCE (it feeds
    both the per-order rollup and the qualifying-row filter — two
    DataFrame instances of the same aggregate have distinct expression
    ids, so ReuseExchange cannot dedup them and the fact join + first
    aggregate would run twice; the multi-leg recompute class fixed across
    the graph queries). The two legs then each re-shuffle the
    MATERIALIZED rollup on l_orderkey — self-join re-aliasing defeats
    exchange reuse even over the same RDD, so the honest count is two
    exchanges over the (order, supplier)-grain intermediate (≪ the fact
    table; bounded with the exchange-count pin in test_plans). On a real
    cluster, bucketing the persisted rollup by order key removes both.
    Supplier and nation broadcast; the F-status filter prunes orders
    before the fact join."""
    od = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ls = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
        .localCheckpoint(eager=True)
    )
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ls = ls.repartition(p, "l_orderkey")
    po = ls.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_name")
    na = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9").select(
        "n_nationkey"
    )
    return (
        ls.join(po, F.col("l_orderkey") == F.col("po_key"))
        .filter(
            (F.col("is_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@_q(
    "tpch_q4_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders of one year with at
    least one line shipped more than 30 days after the order date,
    counted by priority — the canonical EXISTS whose correlated predicate
    mixes BOTH relations (l_shipdate vs o_orderdate), so the decorrelated
    form is a LEFT SEMI join with a non-equi residual on the join, not a
    plain key semi. Lateness adapted to ship-lag (the trimmed schema has
    no commit/receipt dates).

    Scale: the order-date year is a pushed scan range on orders
    (PushedFilters); the semi join dedups lineitem's multi-match rows
    inside the join operator itself (no distinct needed — EXISTS
    semantics are the join type), and the 5-key priority aggregate is
    map-side dominated."""
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        od.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "tpch_q9_product_profit",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 2) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: profit per (supplier
    nation, order year) for parts whose name contains a substring — the
    LIKE-filtered five-join star with a DERIVED measure built from two
    tables' columns (revenue minus cost). Cost basis adapted to
    0.6 · p_retailprice · quantity: the trimmed schema carries no
    partsupp/ps_supplycost, and a fixed margin preserves exactly the
    shape that matters — the measure references part AND lineitem columns,
    so the part join cannot be pruned away even though no part column is
    grouped on.

    Scale: the contains-LIKE is NOT scan-pushable (no prefix) — the
    filter runs post-scan on `part`, but part is the SMALL side and the
    filtered result broadcasts, so the fact table still only flows
    through broadcast joins plus the one orders shuffle. Group space is
    nations × years (~175)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    pa = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey", "p_retailprice")
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dround(F.sum(profit), 2).alias("profit"))
    )


@_q(
    "tpch_q2_min_cost_supplier",
    """
    WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    cand AS (
        SELECT p_partkey, s_name, s_acctbal, n_name,
               CAST((l_suppkey * 7919 + l_partkey * 104729) % 100000
                    AS BIGINT) AS supply_cost
        FROM pairs
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size BETWEEN 10 AND 20
          AND p_type IN ('LARGE', 'STANDARD')
          AND r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name,
           p_partkey, supply_cost
    FROM cand
    JOIN (SELECT p_partkey AS mk, min(supply_cost) AS mc
          FROM cand GROUP BY p_partkey) m
      ON p_partkey = mk AND supply_cost = mc
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: for each qualifying
    part, the supplier(s) in a region offering it at the minimum supply
    cost — the classic CORRELATED-MIN scalar subquery, decorrelated into
    a per-part min aggregate equality-joined back to the candidates. The
    trimmed schema has no partsupp, so (a) the part↔supplier relation is
    the DISTINCT (l_partkey, l_suppkey) pairs actually observed in
    lineitem, and (b) supply cost is a deterministic integer hash of the
    pair — exact in both engines, preserving exactly the shape that
    matters (the min-equality can't tolerate float fuzz; two suppliers
    tying at the min must BOTH survive, as in the spec).

    Scale: part/supplier/nation/region all broadcast; the one big input
    (lineitem) is first semi-reduced by the broadcast part filter, THEN
    deduplicated — the distinct shuffles only qualifying pairs, not the
    whole fact. `cand` is localCheckpointed so the min aggregate and the
    join-back don't recompute the pair dedup. The LIMIT is deterministic:
    the ORDER BY is a total order ((p_partkey, s_name) is unique per
    candidate row).

    Reference: closes the last correlated-subquery TPC-H shape missing
    from §2.C's decision-support row (reference README.md:234 'query the
    Hudi table with Spark SQL')."""
    pa = (
        _t(spark, sf_dir, "part")
        .filter(
            F.col("p_size").between(10, 20)
            & F.col("p_type").isin("LARGE", "STANDARD")
        )
        .select("p_partkey")
    )
    su = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cost = ((F.col("l_suppkey") * 7919 + F.col("l_partkey") * 104729) % 100000).cast(
        "long"
    )
    cand = (
        pairs.join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "s_acctbal",
            "n_name",
            cost.alias("supply_cost"),
        )
        .localCheckpoint(eager=False)
    )
    mins = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("supply_cost").alias("mc")
    )
    return (
        cand.join(
            F.broadcast(mins),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("supply_cost") == F.col("mc")),
        )
        .select(
            dround(F.col("s_acctbal"), 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "supply_cost",
        )
        .orderBy(
            F.col("acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@_q(
    "tpch_q11_important_parts",
    """
    WITH val AS (
        SELECT l_partkey AS partkey,
               sum(CAST(l_quantity * p_retailprice AS DECIMAL(18,6)))
                 AS val_exact
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_9', 'NATION_11')
        GROUP BY l_partkey
    ),
    tot AS (
        SELECT sum(val_exact) AS total, count(*) AS cnt FROM val
    )
    SELECT partkey, round(CAST(val_exact AS DOUBLE), 2) AS value
    FROM val, tot
    WHERE CAST(val_exact AS DECIMAL(24,6)) * CAST(2 * cnt AS DECIMAL(13,0))
        > CAST(total AS DECIMAL(34,6)) * CAST(3 AS DECIMAL(2,0))
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted: parts whose inventory value
    held by suppliers of given nations exceeds a threshold fraction of
    the TOTAL — a grouped aggregate filtered by an UNCORRELATED scalar
    subquery over itself. The trimmed schema has no partsupp, so value is
    quantity × retail price over observed lineitems; the spec's fixed
    fraction is replaced by 1.5× the mean part value (2·val·cnt > 3·total
    — all-integer/decimal arithmetic), which keeps the predicate
    scale-free instead of degenerating to zero rows as part count grows.

    Determinism: the threshold compare is on EXACT decimal sums (per-row
    double products are bit-identical in both engines, cast to
    DECIMAL(18,6), summed order-insensitively) — a part sitting exactly
    at 1.5× mean can't flip on summation order. Only the display column
    rounds back through double. The compare's operand types are PINNED so
    no engine hits its 38-digit cap (a naive ``2*val_exact*cnt`` is
    precision 49 in Spark — scale-truncated or NULL under
    allowPrecisionLoss): val_exact → DECIMAL(24,6) × 2·cnt →
    DECIMAL(13,0) gives a 38,6 product in Spark (37 in DuckDB), and
    total → DECIMAL(34,6) × 3 gives 37,6 (36) — all exact with verified
    headroom (at TPC-H sf100k: per-part value ~1e7 vs 1e18 cap, part
    count ~2e10 vs 5e12, total ~1e17 vs 1e28).

    Scale: ONE fact aggregate keyed by partkey (supplier/nation/part
    broadcast); the total is a second tiny aggregate over part-count rows
    broadcast back as a 1-row cross join. `val` is localCheckpointed so
    its two consumers don't rescan the fact."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    pa = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_9", "NATION_11")
    ).select("n_nationkey")
    term = (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(18,6)")
    val = (
        li.join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(term).alias("val_exact"))
        .localCheckpoint(eager=False)
    )
    tot = val.agg(
        F.sum("val_exact").alias("total"), F.count(F.lit(1)).alias("cnt")
    )
    lhs = F.col("val_exact").cast("decimal(24,6)") * (
        F.lit(2) * F.col("cnt")
    ).cast("decimal(13,0)")
    rhs = F.col("total").cast("decimal(34,6)") * F.lit(3).cast("decimal(2,0)")
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(lhs > rhs)
        .select(
            "partkey",
            dround(F.col("val_exact").cast("double"), 2).alias("value"),
        )
    )


@_q(
    "tpch_q12_late_priority_lines",
    """
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: how many
    HIGH- vs LOW-priority order lines shipped late, per line class — the
    canonical conditional two-way count over a fact-fact join with a
    CROSS-RELATION date residual (shipdate vs orderdate + 60 days: the
    predicate references both join sides, so it can't push below the
    join). The trimmed lineitem has no l_shipmode/l_commitdate/
    l_receiptdate; l_returnflag stands in for the mode grouping and
    ship-after-order+60d for the receipt-after-commit lateness test —
    the same shape, same pushability profile.

    Scale: the shipdate range IS scan-pushable and prunes the fact first;
    the residual runs post-join on surviving rows. One orderkey shuffle
    (AQE broadcasts orders at small SF); both counts come from the SAME
    pass (no self-join), group space = 3 flags."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    od = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        od.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


@_q(
    "tpch_q16_supplier_part_counts",
    """
    WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM pairs JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many distinct
    suppliers can provide parts of each (brand, type, size) combination,
    excluding an unwanted brand/type, a size whitelist, and a NOT-IN
    supplier exclusion set. The trimmed schema has no partsupp (pairs
    come from lineitem, as in Q2) and no s_comment (the spec's
    'complaints' exclusion becomes negative account balance) — the
    shape is intact: DISTINCT-pair source, NOT IN anti-join, and a
    count(DISTINCT) over a three-attribute group.

    Scale: part filters broadcast into the pair dedup (only qualifying
    partkeys shuffle); the exclusion set is tiny and applies as a
    broadcast null-aware anti join (s_suppkey is non-null here, so no
    null-semantics surprise); count(DISTINCT suppkey) re-shuffles by the
    group key — two exchanges total, both on reduced data. Group space
    is brands × types × sizes (~10³) — partials collapse it."""
    pa = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "p_brand", "p_type", "p_size")
        .distinct()
    )
    return (
        pairs.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "tpch_q20_promotable_suppliers",
    """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'
        )
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) > 60
    )
    """,
)
def tpch_q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: suppliers who moved
    significant volume of name-matched parts in a year — the DOUBLE-NESTED
    IN shape (supplier IN {shippers of parts IN {LIKE-matched parts}}
    with a grouped HAVING inside the middle subquery). The trimmed schema
    has no partsupp/ps_availqty, so the spec's 'stock > half of shipped
    qty' becomes 'shipped qty of a single part > 60 units' — the nesting
    and decorrelation structure (two semi joins, inner group-filter) is
    what this query pins, and it survives intact.

    Determinism: l_quantity is integer-valued; per-row BIGINT casts make
    the HAVING sum exact in both engines.

    Scale: the part LIKE-filter broadcasts into the year-pruned fact scan
    (the date range pushes to parquet; contains-LIKE can't, but runs on
    the small part side only); the grouped HAVING keys on
    (suppkey, partkey) — one fact shuffle; the surviving suppkey set is
    tiny and applies to supplier as a broadcast LEFT SEMI."""
    pa = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains("gear")
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    movers = (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
        .distinct()
    )
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        su.join(
            F.broadcast(movers),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )
