"""Measure the SemDeDup driver-side k-means fit AT its structural ceiling.

The fit (operators/similarity._kmeans_fit_sample) is bounded by design:
sample_size=50_000 rows x k_max=4096 cells x the embedding dim — constant
beyond, whatever the table size (semantic_dedup_report sizes
k = min(n // target_cell, 4096)). Rounds 8-9 documented that bound but never
timed it; this tool synthesizes the exact ceiling case (50k x dim Gaussian
mixture so the clustering is non-degenerate), runs the REAL fit function
through a Spark DataFrame, and times (a) the driver-side fit and (b) one
distributed multi-assignment pass over the same rows — the part that DOES
scale with table size and must dominate at 100 TB.

Usage: python tools/semdedup_ceiling.py [--dim 64] [--sample 50000] [--k 4096]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--sample", type=int, default=50_000)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--max-iter", type=int, default=8)
    args = ap.parse_args()

    from debezium_emr_hudi_deltastreamer_sample_spark.operators.similarity import (
        _kmeans_fit_sample,
        _multi_assign_udf,
    )
    from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark

    spark = get_spark(app_name="semdedup_ceiling", shuffle_partitions=32)

    # Gaussian mixture: 256 true modes, so k-means++ has real structure to
    # chase (uniform noise would converge in 1-2 Lloyd iterations and
    # understate the ceiling).
    rng = np.random.default_rng(7)
    modes = rng.standard_normal((256, args.dim))
    assign = rng.integers(0, len(modes), args.sample)
    vecs = modes[assign] + 0.25 * rng.standard_normal((args.sample, args.dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype("float32")

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(args.sample), "embedding": list(vecs)})
    ).localCheckpoint(eager=True)
    n = df.count()

    t0 = time.monotonic()
    centroids = _kmeans_fit_sample(
        df, "embedding", nlist=args.k, seed=7, max_iter=args.max_iter, n=n,
        sample_size=args.sample,
    )
    fit_s = time.monotonic() - t0

    # The distributed side: one multi-assign pass (nassign=2), the per-row
    # cost every table row pays once — linear in table size by construction.
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    udf = _multi_assign_udf(centroids.astype("float64"), 2)
    df.select(udf(F.col("embedding")).alias("a")).selectExpr(
        "sum(a.cells[0]) as s"
    ).collect()
    assign_s = time.monotonic() - t0

    print(
        json.dumps(
            {
                "metric": "semdedup_ceiling_fit",
                "sample": args.sample,
                "k": args.k,
                "dim": args.dim,
                "max_iter": args.max_iter,
                "fit_sec": round(fit_s, 2),
                "assign_pass_sec": round(assign_s, 2),
                "centroids_shape": list(centroids.shape),
            }
        )
    )


if __name__ == "__main__":
    main()
