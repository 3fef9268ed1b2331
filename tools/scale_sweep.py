"""Scaling sweep: run batch headline queries at sf0.001 / 0.01 / 0.1 and
report how wall time grows as data grows 10× per step — empirical evidence
for the "would this plan survive a scale-up" question.

Reading the numbers: at these fixture sizes fixed overhead (planning, task
launch) dominates, so a healthy scalable plan shows growth factors well
BELOW the 10× data growth; a factor ≫ 10× between adjacent scale points is
the smell of super-linear work (O(n²) pair explosion, broadcast flipping
to shuffle, spill).

Usage:  python tools/scale_sweep.py
Prints ONE JSON line:
  {"queries": {name: {"sf0.001": s, "sf0.01": s, "sf0.1": s,
               "growth_01_to_1": r}}, "worst_growth": r}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["sf0.001", "sf0.01", "sf0.1"]

#: Batch-only subset (streaming queries carry state-store setup noise that
#: swamps the scaling signal at these sizes).
QUERIES = [
    "pricing_summary",
    "join_star_revenue",
    "window_topk_per_group",
    "cdc_merge_upsert",
    "llm_exact_dedup",
    "llm_token_stats",
    "llm_minhash_lsh",
    "llm_cosine_topk",
    "llm_dedup_clusters",
    "llm_decontaminate",
    "pipe_sessionize",
    "pipe_tfidf_top_terms",
]


def main() -> None:
    from debezium_emr_hudi_deltastreamer_sample_spark.queries import all_queries
    from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark

    spark = get_spark(app_name="scale_sweep")
    qs = all_queries()
    spark.range(1).count()

    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        out[name] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/{sf}"
            best = None
            for _ in range(2):  # best-of-2, same rationale as bench.py
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                sec = time.perf_counter() - t0
                best = sec if best is None else min(best, sec)
            out[name][sf] = round(best, 3)
        out[name]["growth_01_to_1"] = round(
            out[name]["sf0.1"] / max(out[name]["sf0.01"], 1e-9), 2
        )
    worst = max(v["growth_01_to_1"] for v in out.values())
    print(json.dumps({"queries": out, "worst_growth": worst}))


if __name__ == "__main__":
    main()
