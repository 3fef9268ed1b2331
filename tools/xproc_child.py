"""Child driver for CROSS-PROCESS lease/restart verification.

The round-10 concurrency hunts were thread-based inside one JVM/Spark
session; real multi-writer corruption comes from two PROCESSES (two
spark-submits). This child is one such process: its own pid, its own
SparkSession, a cold ``_LEASE_OWNER_CACHE`` — everything a restarted or
rogue driver actually has. Spawned by tests/test_cross_process.py and
tools/hunt_xproc_writers.py.

Modes (argv[1]):

``pipeline <workdir> <ckpt_name>``
    Run the engine's flagship A4 shape — a checkpointed availableNow
    foreachBatch upsert pipeline over ``<workdir>/in`` into
    ``<workdir>/table`` with checkpoint ``<workdir>/<ckpt_name>``. Prints
    ``RESULT <sorted (id, v) json>`` on success, ``FENCED`` (exit 3) when
    the writer lease refuses the pipeline.

``writer <table> <writer_id> <take_over 0|1> <batches_json> [jitter_ms]``
    Ad-hoc KeyedTable writer: apply each batch (list of [id, v, op, lsn]
    rows) in order with optional random jitter between commits. Prints one
    line per attempt: ``COMMIT <i> <epoch_ms_done>`` or ``FENCED <i>``;
    stops at the first fencing (a production pipeline dies there too).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(app: str, workdir: str):
    from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark

    return get_spark(
        app_name=app,
        master="local[2]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "1g",
            "spark.sql.warehouse.dir": f"{workdir}/wh",
        },
    )


def _pipeline(workdir: str, ckpt_name: str) -> int:
    from debezium_emr_hudi_deltastreamer_sample_spark.streaming.pipeline import (
        run_until_drained,
        start_pipeline,
        upsert_batch_processor,
    )

    spark = _spark(f"xproc-pipeline-{os.getpid()}", workdir)
    schema = "id int, v string, op string, _lsn long"
    stream = spark.readStream.schema(schema).json(f"{workdir}/in")
    process = upsert_batch_processor(
        f"{workdir}/table", keys=["id"], parser=lambda df: df
    )
    try:
        q = start_pipeline(
            stream, process, checkpoint=f"{workdir}/{ckpt_name}", available_now=True
        )
        run_until_drained(q, timeout_sec=300)
    except Exception as e:  # noqa: BLE001 — classify, then report
        if "ConcurrentWriterError" in str(e) or "owned by writer" in str(e):
            print("FENCED", flush=True)
            spark.stop()
            return 3
        raise
    rows = sorted(
        (r.id, r.v) for r in spark.read.parquet(f"{workdir}/table").collect()
    )
    print("RESULT " + json.dumps(rows), flush=True)
    spark.stop()
    return 0


def _writer(
    table_path: str, writer_id: str, take_over: bool, batches, jitter_ms: int
) -> int:
    from debezium_emr_hudi_deltastreamer_sample_spark.table import (
        ConcurrentWriterError,
        KeyedTable,
    )

    spark = _spark(f"xproc-writer-{writer_id}", os.path.dirname(table_path))
    rng = random.Random(f"{writer_id}-{os.getpid()}")
    for i, rows in enumerate(batches):
        if jitter_ms:
            time.sleep(rng.uniform(0, jitter_ms / 1000.0))
        t = KeyedTable(
            spark,
            table_path,
            keys=["id"],
            writer_id=writer_id,
            # One-shot by table contract; also one-shot across this loop.
            take_over=(take_over and i == 0),
        )
        df = spark.createDataFrame(
            [tuple(r) for r in rows], "id int, v string, op string, _lsn long"
        )
        try:
            t.upsert(df)
            print(f"COMMIT {i} {int(time.time() * 1000)}", flush=True)
        except ConcurrentWriterError:
            print(f"FENCED {i}", flush=True)
            break
    spark.stop()
    return 0


def main() -> int:
    mode = sys.argv[1]
    if mode == "pipeline":
        return _pipeline(sys.argv[2], sys.argv[3])
    if mode == "writer":
        return _writer(
            sys.argv[2],
            sys.argv[3],
            sys.argv[4] == "1",
            json.loads(sys.argv[5]),
            int(sys.argv[6]) if len(sys.argv) > 6 else 0,
        )
    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    sys.exit(main())
