"""Differential query fuzzer: seeded random SQL trees over the fixture
schemas, executed by BOTH engines (Spark SQL on `catalog.load_table` views,
DuckDB on the raw parquet) and compared with the same order-insensitive
canonicalization as tools/parity.py.

Why: the 218 curated queries are all green — the residual correctness risk
lives in expression/type corners no curated query exercises (operator
precedence, NULL propagation through CASE/IN/LIKE, outer-join + aggregate
interactions, three-valued logic under NOT). A generator covers those
corners combinatorially; a divergence is either a bug in our
session/catalog normalization (the thing this repo owns) or a genuine
engine-behavior cliff that curated queries must then avoid explicitly.

Dialect discipline — every generated query must mean the same thing in
Spark SQL (ANSI mode) and DuckDB, so the generator stays inside the common
subset:
  - no division (ANSI div-by-zero errors; int `/` result types differ),
  - integer arithmetic on BIGINT columns with small literals (no overflow:
    key magnitudes ~1e6, products with literals ≤ 1e9 stay far under 2^63),
  - `%` only with positive literal divisors (both engines truncate),
  - strings: upper/lower/length/substr/trim/replace/`||`/LIKE — identical,
  - timestamps only under EXTRACT(part) or CAST(.. AS DATE) (the fixture's
    TIMESTAMP(NANOS) renders differently raw; both engines agree on the
    extracted parts the curated queries already rely on),
  - floats only from parquet values and SUM/AVG/MIN/MAX over them — the
    canon's 6-significant-digit float format absorbs summation-order noise
    (positive-dominated columns, no cancellation),
  - aggregates aliased identically on both sides (the driver-hash rule).

Usage:
  python tools/fuzz_parity.py --count 500 --seed 42 [--sf-dir DIR] [-v]
Exit 0 iff every case matches. Each case prints its seed on failure so it
replays standalone: --count 1 --seed <case_seed>.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_FUZZ_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Schema model: (column, type) per table, plus the equi-join graph.
# Types: "int" (int32/int64 — arithmetic-safe), "float", "str", "ts".
# ---------------------------------------------------------------------------

TABLES: dict[str, list[tuple[str, str]]] = {
    "lineitem": [
        ("l_orderkey", "int"), ("l_partkey", "int"), ("l_suppkey", "int"),
        ("l_linenumber", "int"), ("l_quantity", "float"),
        ("l_extendedprice", "float"), ("l_discount", "float"),
        ("l_tax", "float"), ("l_returnflag", "str"), ("l_linestatus", "str"),
        ("l_shipdate", "ts"),
    ],
    "orders": [
        ("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"),
        ("o_totalprice", "float"), ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ],
    "customer": [
        ("c_custkey", "int"), ("c_name", "str"), ("c_nationkey", "int"),
        ("c_acctbal", "float"), ("c_mktsegment", "str"),
    ],
    "part": [
        ("p_partkey", "int"), ("p_name", "str"), ("p_brand", "str"),
        ("p_type", "str"), ("p_size", "int"), ("p_retailprice", "float"),
    ],
    "supplier": [
        ("s_suppkey", "int"), ("s_name", "str"), ("s_nationkey", "int"),
        ("s_acctbal", "float"),
    ],
    "nation": [
        ("n_nationkey", "int"), ("n_name", "str"), ("n_regionkey", "int"),
    ],
    "region": [("r_regionkey", "int"), ("r_name", "str")],
    "events": [
        ("event_id", "int"), ("ts", "ts"), ("user_id", "int"),
        ("event_type", "str"), ("value", "float"), ("props", "str"),
    ],
    "documents": [
        ("doc_id", "int"), ("text", "str"), ("lang", "str"),
        ("source", "str"), ("n_chars", "int"),
    ],
}

#: (left table, right table, join condition) — the fixture's FK edges.
JOIN_GRAPH: list[tuple[str, str, str]] = [
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("lineitem", "supplier", "l_suppkey = s_suppkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
    ("supplier", "nation", "s_nationkey = n_nationkey"),
    ("nation", "region", "n_regionkey = r_regionkey"),
]

#: Unique row key per table (single column, or a column pair for lineitem)
#: — the deterministic final tiebreak for ORDER BY ... LIMIT and window
#: ordering (without it, top-k and rank results are tie-dependent and the
#: engines may legitimately disagree).
UNIQUE_KEYS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_linenumber"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
}

#: Literal pools per string column family so predicates actually select —
#: random strings would make every LIKE/= predicate empty (fuzzing nothing).
STR_LITERALS: dict[str, list[str]] = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
    "lang": ["en", "de", "fr", "es", "zz"],
    "source": ["web", "wiki", "code", "news"],
    "event_type": ["click", "view", "purchase", "login", "logout"],
    "_default": ["a", "e", "o", "1", "x", "NATION", "Customer", "%er%"],
}


class Gen:
    """One random query, reproducible from its seed."""

    def __init__(self, seed: int):
        self.rng = random.Random(seed)
        self.seed = seed

    # -- leaf helpers ------------------------------------------------------

    def cols(self, table: str, alias: str, typ: str) -> list[str]:
        return [f"{alias}.{c}" for c, t in TABLES[table] if t == typ]

    def str_literal(self, col: str) -> str:
        base = col.split(".")[-1]
        pool = STR_LITERALS.get(base, STR_LITERALS["_default"])
        v = self.rng.choice(pool)
        return "'" + v.replace("'", "''") + "'"

    # -- expressions (return SQL text valid in both dialects) --------------

    def int_expr(self, int_cols: list[str], depth: int = 2) -> str:
        r = self.rng
        if depth == 0 or not int_cols or r.random() < 0.3:
            if int_cols and r.random() < 0.8:
                return r.choice(int_cols)
            return str(r.randint(0, 50))
        kind = r.randrange(6)
        if kind == 5:
            # NULLIF injects NULLs into downstream arithmetic/aggregates —
            # null-propagation and null-skipping are prime corner space
            a = self.int_expr(int_cols, depth - 1)
            b = self.int_expr(int_cols, depth - 1)
            return f"nullif({a}, {b})"
        if kind == 0:
            a = self.int_expr(int_cols, depth - 1)
            b = self.int_expr(int_cols, depth - 1)
            op = r.choice(["+", "-"])
            return f"({a} {op} {b})"
        if kind == 1:
            a = self.int_expr(int_cols, depth - 1)
            return f"({a} * {r.randint(2, 9)})"
        if kind == 2:
            a = self.int_expr(int_cols, depth - 1)
            return f"(abs({a}) % {r.randint(2, 13)})"
        if kind == 3:
            cond = self.bool_expr(int_cols, [], depth - 1)
            a = self.int_expr(int_cols, depth - 1)
            b = self.int_expr(int_cols, depth - 1)
            return f"(CASE WHEN {cond} THEN {a} ELSE {b} END)"
        a = self.int_expr(int_cols, depth - 1)
        b = self.int_expr(int_cols, depth - 1)
        fn = r.choice(["least", "greatest"])
        return f"{fn}({a}, {b})"

    def str_expr(self, str_cols: list[str], depth: int = 2) -> str:
        r = self.rng
        if depth == 0 or not str_cols or r.random() < 0.4:
            if str_cols:
                return r.choice(str_cols)
            return "'k'"
        kind = r.randrange(5)
        a = self.str_expr(str_cols, depth - 1)
        if kind == 0:
            return f"upper({a})"
        if kind == 1:
            return f"lower({a})"
        if kind == 2:
            return f"substr({a}, {r.randint(1, 4)}, {r.randint(1, 6)})"
        if kind == 3:
            b = self.str_expr(str_cols, depth - 1)
            return f"({a} || {b})"
        return f"coalesce({a}, '~')"

    def bool_expr(self, int_cols: list[str], str_cols: list[str], depth: int = 2) -> str:
        r = self.rng
        if depth == 0 or r.random() < 0.35:
            # comparison leaf
            if int_cols and (not str_cols or r.random() < 0.6):
                a = self.int_expr(int_cols, 1)
                op = r.choice(["<", "<=", ">", ">=", "=", "<>"])
                b = (
                    self.int_expr(int_cols, 1)
                    if r.random() < 0.4
                    else str(r.randint(0, 2000))
                )
                return f"{a} {op} {b}"
            if str_cols:
                c = r.choice(str_cols)
                k = r.randrange(4)
                if k == 0:
                    return f"{c} = {self.str_literal(c)}"
                if k == 1:
                    lit = self.str_literal(c).strip("'")
                    pat = r.choice([f"%{lit}%", f"{lit}%", f"%{lit}"])
                    return f"{c} LIKE '{pat}'"
                if k == 2:
                    lits = ", ".join(
                        sorted({self.str_literal(c) for _ in range(r.randint(1, 3))})
                    )
                    neg = "NOT " if r.random() < 0.3 else ""
                    return f"{c} {neg}IN ({lits})"
                return f"{c} IS {'NOT ' if r.random() < 0.5 else ''}NULL"
            return "1 = 1"
        kind = r.randrange(3)
        a = self.bool_expr(int_cols, str_cols, depth - 1)
        b = self.bool_expr(int_cols, str_cols, depth - 1)
        if kind == 0:
            return f"({a} AND {b})"
        if kind == 1:
            return f"({a} OR {b})"
        return f"(NOT {a})"

    # -- full query --------------------------------------------------------

    def query(self) -> str:
        r = self.rng
        # FROM clause: single table (60%) or one FK join (40%).
        if r.random() < 0.6:
            t = r.choice(list(TABLES))
            from_sql = t
            scope = [(t, t)]
        else:
            lt, rt, cond = r.choice(JOIN_GRAPH)
            jt = r.choice(["JOIN", "LEFT JOIN", "JOIN", "FULL JOIN"])
            from_sql = f"{lt} {jt} {rt} ON {cond}"
            scope = [(lt, lt), (rt, rt)]

        int_cols = [c for t, a in scope for c in self.cols(t, a, "int")]
        str_cols = [c for t, a in scope for c in self.cols(t, a, "str")]
        float_cols = [c for t, a in scope for c in self.cols(t, a, "float")]
        ts_cols = [c for t, a in scope for c in self.cols(t, a, "ts")]

        where = ""
        if r.random() < 0.75:
            where = f" WHERE {self.bool_expr(int_cols, str_cols, 2)}"

        shape = r.randrange(12)
        if shape < 5:
            # grouped aggregation (the workhorse shape)
            keys = []
            for _ in range(r.randint(1, 2)):
                if str_cols and r.random() < 0.6:
                    keys.append(self.str_expr(str_cols, 1))
                elif ts_cols and r.random() < 0.3:
                    part = r.choice(["YEAR", "MONTH"])
                    keys.append(f"EXTRACT({part} FROM {r.choice(ts_cols)})")
                elif int_cols:
                    keys.append(f"(abs({r.choice(int_cols)}) % {r.randint(2, 7)})")
                else:
                    keys.append("1")
            keys = list(dict.fromkeys(keys))
            aggs = ["count(*) AS cnt"]
            for i in range(r.randint(1, 3)):
                k = r.randrange(7)
                if k == 6 and int_cols:
                    # conditional aggregate — NULL/three-valued logic
                    # inside the CASE meets the aggregate's null-skipping
                    cond = self.bool_expr(int_cols, str_cols, 1)
                    aggs.append(
                        f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS s{i}"
                    )
                elif k == 0 and int_cols:
                    aggs.append(
                        f"sum(CAST({r.choice(int_cols)} AS BIGINT)) AS s{i}"
                    )
                elif k == 1 and float_cols:
                    aggs.append(f"sum({r.choice(float_cols)}) AS s{i}")
                elif k == 2 and float_cols:
                    aggs.append(f"avg({r.choice(float_cols)}) AS s{i}")
                elif k == 3 and int_cols:
                    c = r.choice(int_cols)
                    aggs.append(f"{r.choice(['min', 'max'])}({c}) AS s{i}")
                elif k == 4 and str_cols:
                    c = r.choice(str_cols)
                    aggs.append(f"{r.choice(['min', 'max'])}({c}) AS s{i}")
                elif int_cols:
                    aggs.append(f"count(DISTINCT {r.choice(int_cols)}) AS s{i}")
                else:
                    aggs.append(f"count(*) AS s{i}")
            key_aliases = [f"{k} AS k{i}" for i, k in enumerate(keys)]
            having = ""
            if r.random() < 0.25:
                having = f" HAVING count(*) > {r.randint(0, 5)}"
            return (
                f"SELECT {', '.join(key_aliases + aggs)} FROM {from_sql}"
                f"{where} GROUP BY {', '.join(keys)}{having}"
            )
        if shape < 7:
            # plain projection + filter (multiset compare)
            exprs = []
            for i in range(r.randint(1, 4)):
                k = r.randrange(4)
                if k == 0 and int_cols:
                    exprs.append(f"{self.int_expr(int_cols, 2)} AS e{i}")
                elif k == 1 and str_cols:
                    exprs.append(f"{self.str_expr(str_cols, 2)} AS e{i}")
                elif k == 2 and float_cols:
                    exprs.append(f"{r.choice(float_cols)} AS e{i}")
                elif ts_cols:
                    exprs.append(f"CAST({r.choice(ts_cols)} AS DATE) AS e{i}")
                elif int_cols:
                    exprs.append(f"{self.int_expr(int_cols, 2)} AS e{i}")
                else:
                    exprs.append(f"'x' AS e{i}")
            distinct = "DISTINCT " if r.random() < 0.3 else ""
            tail = ""
            if not distinct and len(scope) == 1 and r.random() < 0.5:
                # ORDER BY every output column with pinned null placement
                # (Spark defaults NULLS FIRST asc, DuckDB NULLS LAST — an
                # unpinned ORDER BY...LIMIT legitimately diverges), plus
                # the table's unique key as final tiebreak so the LIMIT
                # cut is deterministic; the key rides along as a column so
                # both engines cut the same rows AND the canon can see it.
                t0 = scope[0][0]
                ukey = [f"{t0}.{c}" for c in UNIQUE_KEYS[t0]]
                exprs += [f"{k} AS uk{j}" for j, k in enumerate(ukey)]
                n_out = len(exprs)
                direction = r.choice(["ASC", "DESC"])
                nulls = r.choice(["NULLS FIRST", "NULLS LAST"])
                order = ", ".join(
                    f"{j + 1} {direction} {nulls}" for j in range(n_out)
                )
                tail = f" ORDER BY {order} LIMIT {r.randint(1, 40)}"
            return (
                f"SELECT {distinct}{', '.join(exprs)} FROM {from_sql}{where}{tail}"
            )
        if shape < 8:
            # global (ungrouped) aggregate
            aggs = ["count(*) AS cnt"]
            if int_cols:
                aggs.append(f"sum(CAST({r.choice(int_cols)} AS BIGINT)) AS s0")
                aggs.append(f"count(DISTINCT {r.choice(int_cols)}) AS s1")
            if float_cols:
                aggs.append(f"min({r.choice(float_cols)}) AS s2")
            return f"SELECT {', '.join(aggs)} FROM {from_sql}{where}"
        if shape < 9 and len(scope) == 1:
            # subquery over an FK edge: IN / NOT IN, correlated EXISTS /
            # NOT EXISTS, or a scalar-aggregate threshold
            t = scope[0][0]
            edges = [e for e in JOIN_GRAPH if e[0] == t or e[1] == t]
            if edges:
                lt, rt, cond = r.choice(edges)
                lcol, rcol = (x.strip() for x in cond.split("="))
                me, other, mine, theirs = (
                    (lt, rt, lcol, rcol) if t == lt else (rt, lt, rcol, lcol)
                )
                oint = self.cols(other, other, "int")
                ostr = self.cols(other, other, "str")
                sub_where = (
                    f" WHERE {self.bool_expr(oint, ostr, 1)}"
                    if r.random() < 0.8
                    else ""
                )
                kind = r.randrange(3)
                if kind == 0:
                    # NOT IN only when the subquery column is a non-null FK
                    # (three-valued logic makes NOT IN with NULLs a trap
                    # both engines agree on, but empty-by-NULL results
                    # fuzz nothing)
                    neg = "NOT " if r.random() < 0.3 else ""
                    return (
                        f"SELECT count(*) AS cnt FROM {t} WHERE {mine} "
                        f"{neg}IN (SELECT {theirs} FROM {other}{sub_where})"
                    )
                if kind == 1:
                    # correlated EXISTS — the correlation predicate is the
                    # FK equality; extra uncorrelated filter inside
                    glue = "AND" if sub_where else "WHERE"
                    neg = "NOT " if r.random() < 0.4 else ""
                    return (
                        f"SELECT count(*) AS cnt FROM {t} WHERE {neg}EXISTS "
                        f"(SELECT 1 FROM {other}{sub_where} {glue} "
                        f"{theirs} = {mine})"
                    )
                # scalar-aggregate threshold: exact aggregates only
                # (min/max/count — an avg would reintroduce float-boundary
                # compares INSIDE the predicate where tolerance can't help)
                okeys = oint or [f"1"]
                agg = r.choice(["min", "max"])
                return (
                    f"SELECT count(*) AS cnt FROM {t} WHERE {mine} "
                    f"{r.choice(['<=', '>', '<>'])} (SELECT "
                    f"{agg}({r.choice(okeys)}) FROM {other}{sub_where})"
                )
        if shape < 11 and len(scope) == 1:
            # window function over a deterministic full ordering: the
            # table's unique key breaks every tie, so rank/row_number/
            # running sums are engine-independent
            t0 = scope[0][0]
            ukey = ", ".join(f"{t0}.{c}" for c in UNIQUE_KEYS[t0])
            part = ""
            if str_cols and r.random() < 0.7:
                part = f"PARTITION BY {r.choice(str_cols)} "
            elif int_cols:
                part = f"PARTITION BY (abs({r.choice(int_cols)}) % {r.randint(2, 5)}) "
            fn = r.choice(
                ["row_number()", "rank()", "dense_rank()", "count(*)"]
            )
            direction = r.choice(["ASC", "DESC"])
            win = f"{fn} OVER ({part}ORDER BY {ukey} {direction})"
            sel = [f"{k} AS uk{j}" for j, k in enumerate(UNIQUE_KEYS[t0])]
            sel.append(f"{win} AS w0")
            return f"SELECT {', '.join(sel)} FROM {t0}{where}"
        # set op of two single-column selects, each with its OWN predicate
        # (the outer `where` is scoped to `from_sql`'s tables, so each set-op
        # side generates one from its own columns — predicates under set ops
        # are part of the corner space this shape exists to fuzz)
        t1 = r.choice(list(TABLES))
        t2 = r.choice(list(TABLES))

        def side(t: str) -> str:
            ic = self.cols(t, t, "int")
            sc = self.cols(t, t, "str")
            e = self.int_expr(ic, 1) if ic else "1"
            w = (
                f" WHERE {self.bool_expr(ic, sc, 1)}"
                if r.random() < 0.7
                else ""
            )
            return f"SELECT {e} AS u FROM {t}{w}"

        op = r.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        return f"{side(t1)} {op} {side(t2)}"


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------


def make_spark(sf_dir: str):
    from debezium_emr_hudi_deltastreamer_sample_spark.catalog import load_table
    from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark

    spark = get_spark(app_name="fuzz_parity", shuffle_partitions=8)
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark


def make_duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Directory fixtures (the synthesized sf1 decade is Spark-written
        # part-file dirs) need a glob; DuckDB errors on a bare dir path.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _tolerant_match(srows, scols, orows, ocols) -> bool:
    """Order-insensitive compare with float tolerance — the fallback when
    the exact 6-sig-digit canon mismatches. Double aggregations legitimately
    differ by a few ULPs between engines (summation order), and a group sum
    sitting exactly on a format boundary (e.g. 14288.45 → '14288.4' vs
    '14288.5') is a false positive at ANY fixed precision. Rows are sorted
    by their non-float cells first, float-tied blocks by value (two floats
    within tolerance of EACH OTHER sort adjacently either way, so
    cross-pairing inside a tie block only swaps values that already pass),
    then floats compare with isclose."""
    import math

    from tools.parity import norm_cell

    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])

    def keyed(rows, order):
        out = []
        for r in rows:
            cells = [r[i] for i in order]
            key = tuple(
                "~float~" if isinstance(c, float) else norm_cell(c)
                for c in cells
            ) + tuple(
                # NaN breaks tuple ordering; sort it as +inf (both sides)
                float("inf") if c != c else c
                for c in cells
                if isinstance(c, float)
            )
            out.append((key, cells))
        out.sort(key=lambda kc: kc[0])
        return [c for _, c in out]

    for srow, orow in zip(keyed(srows, sorder), keyed(orows, oorder)):
        for sv, ov in zip(srow, orow):
            if isinstance(sv, float) and isinstance(ov, float):
                if math.isnan(sv) and math.isnan(ov):
                    continue
                if not math.isclose(sv, ov, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif norm_cell(sv) != norm_cell(ov):
                return False
    return True


def run_case(spark, con, sql: str) -> tuple[bool, str]:
    """Execute on both engines; return (match, detail)."""
    from tools.parity import canon

    sdf = spark.sql(sql)
    scols = [f.name for f in sdf.schema.fields]
    srows = sdf.collect()
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        return False, f"schema: spark={sorted(scols)} duck={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"rows: spark={len(srows)} duck={len(orows)}"
    sc = canon(srows, scols)
    oc = canon(orows, ocols)
    if sc != oc:
        if _tolerant_match(srows, scols, orows, ocols):
            return True, f"{len(srows)} rows (float-tolerant)"
        diff = next(
            (i for i, (x, y) in enumerate(zip(sc, oc)) if x != y), len(sc) - 1
        )
        return False, f"values at canon row {diff}: spark={sc[diff]} duck={oc[diff]}"
    return True, f"{len(srows)} rows"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    spark = make_spark(args.sf_dir)
    con = make_duck(args.sf_dir)

    failures = 0
    for i in range(args.count):
        case_seed = args.seed if args.count == 1 else args.seed * 1_000_003 + i
        sql = Gen(case_seed).query()
        try:
            ok, detail = run_case(spark, con, sql)
        except Exception as e:  # engine error — a dialect leak in the generator
            ok, detail = False, f"error: {type(e).__name__}: {str(e)[:300]}"
        if not ok:
            failures += 1
            print(f"FAIL seed={case_seed}\n  {sql}\n  {detail}")
        elif args.verbose:
            print(f"ok seed={case_seed} ({detail}): {sql[:120]}")
    print(f"{args.count - failures}/{args.count} fuzz cases match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
