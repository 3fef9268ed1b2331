"""Synthesize an sf1-scale fixture (10x sf0.1) for the local scale sweep.

The driver ships sf0.001/0.01/0.1 only; the 100x design claims deserve one
more measured decade. This builds sf1 deterministically from sf0.1 —
10 key-shifted replicas per fact table, so value distributions, join
selectivities, and skew shape are preserved while keys stay unique:

- star facts (lineitem/orders/customer/supplier/part): every key column
  offset by replica * (max_key + 1); dimension tables (nation/region) keep
  their real-world-constant size.
- events: ids shifted; ts shifted by replica * (span + 1 day) so event
  time extends instead of stacking (sessionization/windows stay
  non-degenerate).
- documents: doc_id shifted; text prefixed with a per-replica token —
  replicas become NEAR-duplicates (high Jaccard, not exact), which turns
  the corpus into 10-member near-dup clusters: a realistic, harder input
  for the MinHash/LSH/component queries than verbatim copies.
- embeddings: vec_id shifted; a small deterministic per-replica rotation
  of two coordinates keeps replicas near-duplicate in cosine without
  being identical.

Output: $SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1), parquet per
table, idempotent (skips if the marker file exists). Sizes at sf1:
~6 M lineitem, 1 M events, 500 k documents, 500 k embeddings (64-dim).

``--sf3`` synthesizes the FIFTH sweep point for the graph/dedup family
(the only ops still >2x in the sf1 sweep): documents + embeddings ONLY at
30 replicas (~150 k docs / 60 k vectors from the driver fixtures) into
$SPARK_GRAFT_SF3_DIR (default /tmp/spark_graft_sf3). Star/event tables are
deliberately omitted — the sf3 sweep targets llm_graph_*/llm_*dedup*/
pipe_ingest_neardup_gate, which read only these two tables.

Scaling model at sf3: replicas form GROUPS of 10, and groups are mutated
apart (documents: every 5th word gets a group marker, killing ~60% of
cross-group shingles; embeddings: a per-group deterministic sign-flip of
HALF the coordinates — verified cross-group cosine ~0; a one-third flip
was tried and rejected because its ~1/3 cosine lands exactly on the graph
queries' 0.35 edge threshold). Within a group the sf1 near-dup
construction is unchanged. This keeps near-dup CLUSTER SIZE constant
(~10) while cluster COUNT grows with scale — the realistic 100 TB model
(corpus growth adds new content at a constant dup rate). The naive
30-replica alternative grows 30-member cliques whose triangle mass
explodes cubically — a fixture artifact, not an engine property
(measured: the sf3 triangle sweep would not finish).

Replica ceiling: the (j+g)%2 flip admits only two distinct non-base
patterns, so groups repeat every 20 non-base replicas — main() asserts
replicas <= 30 (g in {0,1,2}: base, odd-flip, even-flip; cross-group
cosine ~0 / ~-1, both far below every similarity threshold). Scaling the
fixture further needs a per-group pattern family (hash-based flips), not
a bigger replica count.

Usage: python tools/make_sf1.py [--sf3]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
DST3 = os.environ.get("SPARK_GRAFT_SF3_DIR", "/tmp/spark_graft_sf3")
REPLICAS = 10

#: key columns to shift, per table (offset = replica * (max+1) of the
#: table that OWNS the key, so foreign keys stay consistent).
KEY_OWNERS = {
    "c_custkey": "customer",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "p_partkey": "part",
    "s_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events_user",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def main() -> None:
    from pyspark.sql import functions as F

    from debezium_emr_hudi_deltastreamer_sample_spark.catalog import load_table
    from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark

    sf3 = "--sf3" in sys.argv[1:]
    dst = DST3 if sf3 else DST
    replicas = 30 if sf3 else REPLICAS
    # See "Replica ceiling" in the module docstring: g=3 would reuse g=1's
    # flip pattern and silently merge cross-group near-dup clusters.
    assert replicas <= 30, "replica groups repeat past 30 (flip patterns)"
    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker):
        print(f"fixture already present at {dst}")
        return
    spark = get_spark(app_name="make_sf1")

    tables = {
        n: load_table(spark, SRC, n)
        for n in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }

    # Key-owner maxima (drive every shift so FKs stay aligned).
    owner_max = {
        "customer": tables["customer"].agg(F.max("c_custkey")).first()[0],
        "orders": tables["orders"].agg(F.max("o_orderkey")).first()[0],
        "part": tables["part"].agg(F.max("p_partkey")).first()[0],
        "supplier": tables["supplier"].agg(F.max("s_suppkey")).first()[0],
        "events": tables["events"].agg(F.max("event_id")).first()[0],
        "events_user": tables["events"].agg(F.max("user_id")).first()[0],
        "documents": tables["documents"].agg(F.max("doc_id")).first()[0],
        "embeddings": tables["embeddings"].agg(F.max("vec_id")).first()[0],
    }
    ts_min, ts_max = tables["events"].agg(
        F.min("ts"), F.max("ts")
    ).first()
    span_sec = int((ts_max - ts_min).total_seconds()) + 86400

    def replicate(name, extra=None):
        df = tables[name]
        parts = []
        for i in range(replicas):
            r = df
            for col in df.columns:
                if col in KEY_OWNERS:
                    off = i * (int(owner_max[KEY_OWNERS[col]]) + 1)
                    r = r.withColumn(col, F.col(col) + F.lit(off))
            if extra is not None:
                r = extra(r, i)
            parts.append(r)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def events_extra(r, i):
        return r.withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {i * span_sec} SECOND")
        )

    def documents_extra(r, i):
        # Per-replica prefix token -> near-dup (not exact-dup) clusters.
        out = r.withColumn("text", F.concat(F.lit(f"rep{i} "), F.col("text")))
        g = i // 10
        if g > 0:
            # Group mutation (sf3 replicas 10+): marking every 5th word
            # kills ~60% of cross-group shingles, so groups are NOT
            # near-dups of each other — cluster size stays ~10 at every
            # scale. Helper closes over g (a bare lambda default would
            # bind to the HOF's index parameter).
            def mark(w, j):
                return F.when(
                    j % 5 == 2, F.concat(F.lit(f"g{g}_"), w)
                ).otherwise(w)

            out = out.withColumn(
                "text",
                F.array_join(F.transform(F.split("text", " "), mark), " "),
            )
        return out

    def embeddings_extra(r, i):
        if i == 0:
            return r
        # Deterministic tiny perturbation: bump two coordinates by i/100
        # (mod 10 so the 30-replica sf3 build keeps the SAME eps range as
        # sf1) — cosine to the original stays ~1 (near-dup) but not
        # exactly 1. Replicas 10/20 get +0.005 to stay distinct from the
        # base vector. Groups of 10 (sf3) are then pushed APART: a
        # per-group sign-flip of HALF the coordinates drops cross-group
        # cosine to ~0 (a one-third flip landed at ~1/3 — exactly on the
        # graph queries' 0.35 edge threshold, densifying the graph) while
        # within-group near-dups keep the identical flip pattern —
        # constant cluster size at every scale.
        eps = (i % 10) / 100.0 + (i // 10) * 0.005
        g = i // 10

        def perturb(x, j):
            bumped = F.when(j < 2, x + F.lit(eps)).otherwise(x)
            if g == 0:
                return bumped
            return F.when((j + g) % 2 == 0, -bumped).otherwise(bumped)

        return r.withColumn(
            "embedding", F.transform(F.col("embedding"), perturb)
        )

    os.makedirs(dst, exist_ok=True)
    if sf3:
        writes = {
            "documents": replicate("documents", documents_extra),
            "embeddings": replicate("embeddings", embeddings_extra),
        }
    else:
        writes = {
            "region": tables["region"],
            "nation": tables["nation"],
            "customer": replicate("customer"),
            "supplier": replicate("supplier"),
            "part": replicate("part"),
            "orders": replicate("orders"),
            "lineitem": replicate("lineitem"),
            "events": replicate("events", events_extra),
            "documents": replicate("documents", documents_extra),
            "embeddings": replicate("embeddings", embeddings_extra),
        }
    for name, df in writes.items():
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"wrote {name}")
    open(marker, "w").write("ok\n")
    print(f"fixture at {dst}")


if __name__ == "__main__":
    main()
