"""Differential fuzz gate (tools/fuzz_parity.py): 500 seeded random SQL
trees over the fixture schemas, Spark vs DuckDB, canon-compared. Covers the
expression/type corners (operator precedence, NULL propagation through
CASE/IN/LIKE, outer-join + aggregate interaction, set-op semantics) that no
curated parity query exercises. Seeds are fixed, so a red case replays
standalone: `python tools/fuzz_parity.py --count 1 --seed <case_seed>`."""

from __future__ import annotations

import pytest

from tools.fuzz_parity import TABLES, Gen, make_duck, run_case

FUZZ_COUNT = 500
FUZZ_SEED = 42


@pytest.mark.slow
def test_fuzz_differential_500(spark, sf_tiny):
    # Child session: the fuzz registers temp views under the bare fixture
    # names; an isolated catalog keeps them invisible to other tests
    # sharing the session-scoped SparkSession.
    from debezium_emr_hudi_deltastreamer_sample_spark.catalog import load_table

    child = spark.newSession()
    for t in TABLES:
        load_table(child, sf_tiny, t).createOrReplaceTempView(t)
    con = make_duck(sf_tiny)

    failures = []
    for i in range(FUZZ_COUNT):
        case_seed = FUZZ_SEED * 1_000_003 + i
        sql = Gen(case_seed).query()
        try:
            ok, detail = run_case(child, con, sql)
        except Exception as e:
            ok, detail = False, f"error: {type(e).__name__}: {str(e)[:300]}"
        if not ok:
            failures.append((case_seed, sql, detail))
    assert not failures, f"{len(failures)} divergences; first 3: {failures[:3]}"
