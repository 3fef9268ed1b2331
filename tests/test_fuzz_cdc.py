"""CDC differential fuzz gate (tools/fuzz_cdc.py): 170 seeded random
envelope-sequence scenarios (30 per single-table lane + 20 each for the
routed/avro/crash/crashmor lanes) replayed through the COW, MOR, SCD2,
multi-table ROUTED, AVRO-wire, and the two CRASH-INJECTION (COW + MOR)
lanes against pure-Python dict-replay oracles. Gate sizing: a
fuzz case costs ~40 tiny Spark jobs (~2-6 s wall each depending on box
load), so the always-on gate stays at a few minutes while multi-seed CLI
hunts carry the volume — 500+ cases per lane per round, tallies recorded
in COVERAGE.md / BASELINE.md. Covers the stateful
corners no curated test enumerates: out-of-order LSNs across batch
boundaries, all-delete bootstrap batches, schema-drift mid-stream,
at-least-once batch replays, async-compaction races, old-batch
redelivery, and simulated process kills inside the table commit path
(schema publish / data write, before and after the call) followed by
redelivery.

A red case replays standalone with its printed case seed:
  python tools/fuzz_cdc.py --lane <lane> --count 1 --seed <case_seed>
"""

from __future__ import annotations

import pytest

from tools.fuzz_cdc import run_many

COUNT = 30
WORKERS = 12


@pytest.mark.slow
@pytest.mark.parametrize(
    ("lane", "seed"),
    [
        ("cow", 42),
        ("mor", 1042),
        ("scd2", 2042),
        ("routed", 3042),
        ("avro", 4042),
        ("crash", 5042),
        ("crashmor", 6042),
        ("writers", 7042),
    ],
)
def test_fuzz_cdc_lane(spark, lane, seed):
    # routed runs 2 tables/case; avro adds a Python decode per record;
    # the crash lanes replay dead deliveries on top of the replay axis;
    # writers constructs a fresh lease-checked table per batch.
    count = 20 if lane in ("routed", "avro", "crash", "crashmor", "writers") else COUNT
    failures = run_many(spark, lane, count, seed, workers=WORKERS)
    assert not failures, (
        f"{len(failures)} {lane} divergences; first 3: {failures[:3]}"
    )


@pytest.mark.slow
@pytest.mark.parametrize(("lane", "seed"), [("crash", 14001), ("writers", 14002)])
def test_fuzz_cdc_pointer_protocol_gate(spark, monkeypatch, lane, seed):
    """Always-on gate for the object-store commit-POINTER protocol: the
    crash-injection and concurrent-writer lanes under
    SPARK_GRAFT_COMMIT_PROTOCOL=pointer (small count — the multi-seed CLI
    hunts carry the volume; COVERAGE.md records the tallies)."""
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_PROTOCOL", "pointer")
    failures = run_many(spark, lane, 12, seed, workers=WORKERS)
    assert not failures, (
        f"{len(failures)} pointer-protocol {lane} divergences; "
        f"first 3: {failures[:3]}"
    )
