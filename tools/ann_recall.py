"""ANN quality/throughput harness: recall@k of the approximate similarity
paths (LSH, IVF) against brute-force ground truth on the REAL embeddings
fixture, at any scale factor.

The unit tests pin recall on a 30-vector synthetic set; this measures the
numbers that matter for the scale story — recall and wall time on the
fixture distribution (sf0.1 = 2000×64-d vectors, sf0.01 = 500) — so tuning
nlist/nprobe/band_bits is driven by data, not guesses.

Usage:
    python tools/ann_recall.py [sf_dir] [k] [n_queries]
Prints one JSON line:
    {"sf_dir": ..., "k": 10, "n_queries": 50,
     "brute_sec": ..., "lsh": {"recall": ..., "sec": ...},
     "ivf": {"recall": ..., "sec": ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from debezium_emr_hudi_deltastreamer_sample_spark.catalog import load_table
from debezium_emr_hudi_deltastreamer_sample_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    ivf_topk,
)
from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark


def pairs(df) -> set[tuple[int, int]]:
    return {(r.qid, r.cid) for r in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    spark = get_spark(app_name="ann_recall")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries)

    t0 = time.perf_counter()
    brute = pairs(cosine_topk_bruteforce(emb, queries, k=k))
    brute_sec = round(time.perf_counter() - t0, 3)

    out = {
        "sf_dir": sf_dir,
        "k": k,
        "n_queries": n_queries,
        "n_vectors": emb.count(),
        "brute_sec": brute_sec,
    }
    variants = {
        "lsh": lambda: cosine_topk_lsh(emb, queries, k=k, dim=64),
        "ivf": lambda: ivf_topk(emb, queries, k=k, nlist=16, nprobe=6, nassign=2),
    }
    for name, run in variants.items():
        t0 = time.perf_counter()
        approx = pairs(run())
        sec = round(time.perf_counter() - t0, 3)
        out[name] = {"recall": round(len(brute & approx) / len(brute), 4), "sec": sec}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
