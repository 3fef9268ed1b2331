"""Dump .explain('formatted') for bench headline queries to plans/r12/.

Usage:
    python tools/plan_dump.py before [query ...]
    python tools/plan_dump.py after  [query ...]

With no query names, dumps every bench.py HEADLINE query. Streaming
queries (stream_*) execute their replay when constructed — their returned
DataFrame is a memory-sink table, so the captured plan is the final
materialized read plus a header note; the interesting inner plans for
those are discussed in OPTIMIZATION_r12.md against the code.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13"),
)


def main() -> None:
    from bench import HEADLINE
    from debezium_emr_hudi_deltastreamer_sample_spark.queries import all_queries
    from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)

    spark = get_spark(app_name=f"plan_dump_{tag}")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        header = ""
        if name.startswith("stream_"):
            header = (
                "# NOTE: stream_* queries run their availableNow replay at\n"
                "# construction time; the plan below is the final memory-sink\n"
                "# read-back. The streaming micro-batch plans are pinned by\n"
                "# tests/test_plans.py and discussed in OPTIMIZATION_r12.md.\n"
            )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(header + buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
