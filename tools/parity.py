"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
schema (sorted column names) and order-insensitive values.

Usage: python tools/parity.py [name ...]   # default: all
"""

from __future__ import annotations

import math
import sys

import os

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # %.6g for EVERY finite magnitude — a >=1e15 cutover to repr()
        # would make the tolerance cliff scale-dependent (a sum crossing
        # 1e15 at a bigger fixture suddenly compares exact ULPs).
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon(rows, colnames):
    # Case-insensitive name order (original as tiebreak) — the schema gate
    # compares names case-insensitively, so the value alignment must use
    # the same collation or mixed-case aliases would pair wrong columns.
    order = sorted(
        range(len(colnames)), key=lambda i: (colnames[i].lower(), colnames[i])
    )
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


#: Oracle-companion queries whose DuckDB side is O(n²) all-pairs — excluded
#: from the synthesized-sf1 parity by contract (FIXTURES.md §4); each has a
#: scale-safe default sibling that IS checked.
SF1_EXCLUDED = frozenset({
    "llm_ngram_jaccard", "llm_dedup_clusters_exact", "llm_pagerank_exact",
    "llm_embed_neardup", "llm_graph_triangles_exact",
})


def driver_hostile_problems(scols, stypes, ocols, otypes):
    """Problems for result types the driver's value-hash cannot compare.

    The driver's hash is TYPE-sensitive and crashes on list cells: DuckDB
    widening sum(BIGINT)->HUGEINT (int128) or returning LIST/STRUCT/MAP
    columns makes an exact-value match hash-fail or error; Spark-side
    array/struct/map columns do the same. These are GATE failures (exit 1),
    not warnings, so the round-3 class of red (12 HUGEINT casts) cannot
    recur silently. Fix is CAST(sum(..) AS BIGINT) / array_to_string on
    BOTH sides.
    """
    problems = []
    o_hostile = [
        (c, t)
        for c, t in zip(ocols, otypes)
        if "HUGEINT" in t or t.endswith("[]") or "STRUCT" in t or "MAP" in t
    ]
    if o_hostile:
        problems.append(f"driver-hostile oracle types: {o_hostile}")
    s_hostile = [
        (c, t)
        for c, t in zip(scols, stypes)
        if t.startswith(("array", "struct", "map"))
    ]
    if s_hostile:
        problems.append(f"driver-hostile spark types: {s_hostile}")
    return problems


def main(names=None):
    import time

    # Pin the host timezone: PySpark materializes TimestampType through
    # datetime.fromtimestamp (system-local tz) while DuckDB returns stored
    # naive values — on a non-UTC host every timestamp-emitting query
    # would false-FAIL on isoformat. The session conf alone does not reach
    # this Python-side conversion.
    os.environ["TZ"] = "UTC"
    if hasattr(time, "tzset"):
        time.tzset()

    import __spark_entry__ as e

    global SF_DIR
    show_time = bool(names) and "--time" in names
    if show_time:
        names = [n for n in names if n != "--time"] or None
    sf1 = bool(names) and "--sf1" in names
    if sf1:
        names = [n for n in names if n != "--sf1"] or None
        SF_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
        if not os.path.exists(os.path.join(SF_DIR, "_DONE")):
            print(
                f"--sf1 requires the synthesized fixture at {SF_DIR}; run "
                "`python tools/make_sf1.py` first (idempotent)",
                file=sys.stderr,
            )
            return 2

    if os.environ.get("SPARK_GRAFT_PLAIN_SESSION"):
        # Replicate the driver's environment: a default SparkSession with none
        # of session.get_spark()'s confs. Every query must still be correct.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("parity-plain")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "48g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark

        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        # Driver fixtures are single files; the locally-synthesized sf1
        # fixture (tools/make_sf1.py) writes Spark-style DIRECTORIES of
        # part files — glob those so the oracle works at every decade.
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = e.queries(), e.oracle_sql()
    if names:
        unknown = [n for n in names if n not in qs]
        if unknown:
            # A typo'd name would otherwise KeyError inside the Spark try
            # and masquerade as an engine failure.
            print(f"unknown query name(s): {unknown}", file=sys.stderr)
            return 2
    todo = names or list(qs)
    if sf1:
        skipped = [n for n in todo if n in SF1_EXCLUDED]
        todo = [n for n in todo if n not in SF1_EXCLUDED]
        if skipped:
            print(
                f"sf1: skipping O(n²) oracle companions by contract: {skipped}",
                file=sys.stderr,
            )
        if names and not todo:
            # Every explicitly requested name was excluded — a green
            # '0/0 pass' exit would claim a check that never ran.
            print("sf1: nothing to run (all requested names excluded)",
                  file=sys.stderr)
            return 2
    failures = []
    timings = {}
    for name in todo:
        _t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            timings[name] = time.perf_counter() - _t0
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            timings[name] = time.perf_counter() - _t0
            continue
        try:
            orel = con.sql(oracles[name])
            otypes = [str(t) for t in orel.types]
            orows = orel.fetchall()
            ocols = [d[0] for d in orel.description]
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            timings[name] = time.perf_counter() - _t0
            continue
        problems = driver_hostile_problems(
            scols, [f.dataType.simpleString() for f in sdf.schema], ocols, otypes
        )
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            cs, co = canon(srows, scols), canon(orows, ocols)
            if cs != co:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(cs, co)) if a != b), None
                )
                problems.append(
                    f"values differ at sorted-row {diff}: spark={cs[diff] if diff is not None else '?'} duck={co[diff] if diff is not None else '?'}"
                )
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)[:500]}")
        else:
            print(f"ok    {name}: {len(srows)} rows match")
        timings[name] = time.perf_counter() - _t0
    print(f"\n{len(todo) - len(failures)}/{len(todo)} pass")
    if show_time:
        slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
        print("slowest (spark+duck wall sec): " + ", ".join(
            f"{n}={t:.1f}" for n, t in slowest))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
