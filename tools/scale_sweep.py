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

#: Fourth decade: the locally-synthesized sf1 fixture (tools/make_sf1.py,
#: 10x sf0.1 with preserved distributions). Included when present — the
#: growth factor sf0.1->sf1 is the strongest single piece of evidence for
#: the 100x design claims because fixed overheads no longer dominate.
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")

#: Fifth sweep point (3x sf1, documents/embeddings only): the graph/dedup
#: family, the only ops whose sf1 growth stayed >2x. make_sf1.py --sf3.
SF3_DIR = os.environ.get("SPARK_GRAFT_SF3_DIR", "/tmp/spark_graft_sf3")
SF3_QUERIES = [
    "llm_graph_triangles",
    "llm_graph_triangles_count",
    "llm_pagerank",
    "llm_dedup_clusters",
    "llm_semantic_dedup",
    "pipe_ingest_neardup_gate",
]

#: --stream lane: the four streaming headliners (bench.py HEADLINE tail)
#: at sf0.1 -> sf1 — the decade where state-store setup stops dominating.
#: Checkpoints/state dirs go to tmpfs exactly like bench.py so the lane
#: measures the engine, not /tmp fsync.
STREAM_QUERIES = [
    "stream_tumbling_counts",
    "stream_stream_join",
    "stream_rollup_incremental",
    "stream_cdc_upsert",
]

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
    # round 3 additions: span-level dedup (two hash shuffles), the
    # unigram-LM scorer (vocab partial-agg + broadcast join) and the
    # funnel (user-grain reduction + residual-predicate range join).
    "llm_span_dedup",
    "llm_unigram_logprob",
    "pipe_funnel_conversion",
    # Bloom prefilter (driver-side build must stay O(gram-set), probe at
    # scan speed) and the 2-D Z-order re-layout (write-side sort cost).
    "llm_bloom_decontaminate",
    "sink_zorder_readback",
    # Late round-3 family: SemDeDup (cluster equi-join pair mass must stay
    # linear via k ∝ n), corpus-unique-gram novelty (inverted index), the
    # CCNet tercile split (vocab broadcast + per-lang window), the decode→
    # resize lane (fixed-width output rows), and the SCD2 window build.
    "llm_semantic_dedup",
    "llm_ngram_novelty",
    "llm_perplexity_buckets",
    "mm_resize_stats",
    "cdc_scd2_history",
    # TPC-H + analytics family: the fact-heavy star shapes (Q7 double
    # nation, Q10 dual pushed filters, Q18 semi-join filter), the bitmap
    # exact-distinct (shuffle carries bitmaps, not keys), the lead-window
    # pattern matcher, and the URL canonicalization groupBy.
    "tpch_q7_nation_volume",
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "agg_bitmap_distinct",
    "window_pattern_match",
    "pipe_url_normalize",
    # Incremental join-view maintenance: five CDC batches against the
    # orders⋈customer view — per-batch cost must track batch size, not
    # table size.
    "cdc_incremental_join_view",
    # Round 4: the iterative-graph defaults on their LSH edge source —
    # PageRank (batched lazy rounds, pre-partitioned vertex key) and
    # triangle enumeration (oriented edges, two vertex joins), plus the
    # shard-local packer that replaced the global-window default.
    "llm_pagerank",
    "llm_graph_triangles",
    "llm_pack_sequences",
    # Cross-set LSH ingest gate: batch signatures vs corpus index, join
    # bounded by bucket intersections — must track batch size at scale.
    "pipe_ingest_neardup_gate",
    # Round 5: filtered vector search (pushed range predicate before
    # distance work), closure-broadcast semantic decontamination (one
    # corpus scan, no shuffle), and the GDPR cascade (request broadcast
    # into anti/semi joins — corpus must never re-partition).
    "llm_filtered_topk",
    "llm_semantic_decontaminate",
    "pipe_right_to_forget",
    # Round-5 TPC-H closures: the join-ordering benchmark (Q5), the
    # filtered-outer-join histogram (Q13), the decorrelated scalar-avg
    # join (Q17), the per-order rollup rewrite of the double-EXISTS
    # (Q21), and the non-equi semi join (Q4).
    "tpch_q4_priority_check",
    "tpch_q5_local_supplier_volume",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_supplier",
    # Late round 5: the LIKE-filtered derived-measure star and the
    # key-grain write-skew audit.
    "tpch_q9_product_profit",
    "cdc_hot_keys",
    # Round 6: count-only triangles (degree-ordered wedges, one-row
    # output — join mass must stay bounded where enumeration's output
    # volume grows) and the exact cross-set ingest-gate companion
    # (batch-broadcast inverted-index join, must track batch size).
    "llm_graph_triangles_count",
    "pipe_ingest_neardup_gate_exact",
    # Round-6 TPC-H completion: correlated-min over deduped pairs (Q2),
    # scalar-subquery threshold on a checkpointed aggregate (Q11), the
    # cross-relation date residual (Q12), NOT-IN distinct-count (Q16),
    # and the double-nested IN (Q20).
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_parts",
    "tpch_q12_late_priority_lines",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_promotable_suppliers",
    # Round 13 (VERDICT r12 item 3): prove the round-12 structural fixes
    # at the sf1 decade — the dedup-first approx-distinct rewrite (was the
    # sweep's worst non-replay query at 19 s) and the block-pair exact
    # cosine kernel; plus the stage-and-swap COW paths (time travel's
    # linked snapshots, the compact roundtrip).
    "agg_approx_distinct",
    "llm_embed_neardup",
    "cdc_time_travel",
    "table_compact_roundtrip",
    "llm_index_maintain",
]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _sweep_shuffle_partitions(sf_dir: str) -> int:
    """Submit-time shuffle sizing for one sweep point: one partition per
    ~24 MiB of fixture bytes, floored at the session default (32). On a
    real cluster this is exactly what the submit config does — size the
    initial fan-out to the input and let AQE coalesce DOWN. Without it the
    sweep pins 32 partitions at every decade, so a query whose shuffle
    mass grows 6x (e.g. llm_graph_triangles_count's wedges at sf3) pays
    that mass through constant parallelism and the sweep measures the
    CONFIG, not the algorithm (VERDICT r8 task 5: per-wedge cost 1.8x was
    partition absorption, not plan defect)."""
    return max(32, min(2048, -(-_dir_bytes(sf_dir) // (24 << 20))))


#: sf3-lane queries whose SHUFFLE mass grows super-linearly with data
#: (wedge mass Σdeg²/2 measured 6.3x, LSH-verified edge mass 4.4x on 3x
#: data) — these get the scale-multiplied fan-out. The rest of the family
#: is batch-bound (ingest gate), fit-bound (SemDeDup), or linear-mass
#: (PageRank/CC) and measured FASTER at the 32 floor: more partitions
#: only fragment their per-cell BLAS batches / add task overhead.
#: Measured sf3 A/B (BASELINE.md round-9 sweep row): triangles 99-part vs
#: 32-part is the difference between per-unit cost ~1x and ~1.8x, while
#: the same 99 parts cost SemDeDup 2.6x; a 512-initialPartitionNum AQE
#: config loses on every query (shuffle-block fetch fan-out 512x512 on
#: 32 cores). Production analogue: per-job submit sizing by shuffle
#: mass, which AQE cannot do upward from a low initial.
SF3_SCALED_QUERIES = {"llm_graph_triangles", "llm_graph_triangles_count"}


def _scaled_point_partitions(points: list[tuple[str, str]]) -> dict[str, int]:
    """Per-point sizing for the --sf3 lane's mass-growing queries
    (SF3_SCALED_QUERIES), where byte-based sizing fails: the fixture's
    INPUT is small (documents + embeddings only) while the shuffle mass
    is join-side (wedges/edges grow with replica-pair count). The 100 TB
    design center is that CLUSTER SIZE tracks corpus size, so the sweep
    models a submit config scaled to the point: partitions = 32 x (point
    bytes / smallest-point bytes) over the tables every point ships. With
    a constant 32 at every point, each task's in-memory hash/sort state
    grows with the mass and the sweep measures spill/partition-absorption,
    not the algorithm."""
    common = None
    for _sf, sf_dir in points:
        names = {f for f in os.listdir(sf_dir) if f.endswith(".parquet")}
        common = names if common is None else (common & names)
    sizes = {
        sf: sum(_dir_bytes(os.path.join(sf_dir, t)) for t in common or ())
        for sf, sf_dir in points
    }
    nonzero = [b for b in sizes.values() if b]
    if not nonzero:
        raise SystemExit(
            "scale_sweep: sweep points share no common non-empty *.parquet "
            f"tables (points: {[d for _, d in points]}); a half-built or "
            "mismatched fixture dir (stale _DONE?) cannot be size-scaled — "
            "rebuild the fixtures or drop the broken point"
        )
    base = min(nonzero)
    return {
        sf: max(32, min(2048, -(-32 * b // base))) for sf, b in sizes.items()
    }


def main(argv: list[str] | None = None) -> None:
    from debezium_emr_hudi_deltastreamer_sample_spark.queries import all_queries
    from debezium_emr_hudi_deltastreamer_sample_spark.session import get_spark

    argv = argv if argv is not None else sys.argv[1:]
    sf1_only = "--sf1" in argv
    sf3_only = "--sf3" in argv
    stream_lane = "--stream" in argv

    if stream_lane:
        # bench.py's I/O placement: streaming fixed cost is checkpoint/
        # state-store fsync, so point TMPDIR at tmpfs for the lane.
        import shutil
        import tempfile

        shm = os.environ.get("SPARK_GRAFT_BENCH_TMPFS", "/dev/shm")
        if os.path.isdir(shm) and os.access(shm, os.W_OK):
            lane_tmp = tempfile.mkdtemp(prefix="spark_graft_sweep_", dir=shm)
            os.environ["TMPDIR"] = lane_tmp
            tempfile.tempdir = None
            import atexit

            atexit.register(shutil.rmtree, lane_tmp, ignore_errors=True)

    if sf1_only and not os.path.exists(os.path.join(SF1_DIR, "_DONE")):
        print(
            f"--sf1 requires the synthesized fixture at {SF1_DIR}; "
            "run `python tools/make_sf1.py` first (idempotent, ~2 min)",
            file=sys.stderr,
        )
        raise SystemExit(2)
    if sf3_only and not (
        os.path.exists(os.path.join(SF1_DIR, "_DONE"))
        and os.path.exists(os.path.join(SF3_DIR, "_DONE"))
    ):
        print(
            f"--sf3 requires BOTH {SF1_DIR} and {SF3_DIR}; run "
            "`python tools/make_sf1.py` then `python tools/make_sf1.py "
            "--sf3` first",
            file=sys.stderr,
        )
        raise SystemExit(2)

    spark = get_spark(app_name="scale_sweep")
    qs = all_queries()
    spark.range(1).count()

    if stream_lane:
        points = [("sf0.1", "/root/testdata/sf0.1")]
        if os.path.exists(os.path.join(SF1_DIR, "_DONE")):
            points.append(("sf1", SF1_DIR))
    elif sf3_only:
        # Fifth point, graph/dedup family only: sf1 -> sf3 growth on 3x
        # data (documents/embeddings fixtures).
        points = [("sf1", SF1_DIR), ("sf3", SF3_DIR)]
    elif sf1_only:
        # Targeted fourth-decade run: just the sf0.1 -> sf1 growth factors.
        points = [("sf0.1", "/root/testdata/sf0.1")]
        points.append(("sf1", SF1_DIR))
    else:
        points = [(sf, f"/root/testdata/{sf}") for sf in SFS]
        if os.path.exists(os.path.join(SF1_DIR, "_DONE")):
            points.append(("sf1", SF1_DIR))

    queries = (
        STREAM_QUERIES if stream_lane
        else SF3_QUERIES if sf3_only
        else QUERIES
    )
    for a in argv:
        # --only=a,b,c : sweep a subset (chunked runs under a wall clock).
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
            unknown = only - set(queries)
            if unknown:
                print(f"--only names not in this sweep: {unknown}",
                      file=sys.stderr)
                raise SystemExit(2)
            queries = [q for q in queries if q in only]
    # Per-point submit-time shuffle sizing (computed once per fixture).
    # In the sf3 lane, the mass-growing queries (SF3_SCALED_QUERIES) get
    # the scale-multiplied fan-out; everything else keeps the byte-based
    # sizing (which lands on the 32 floor for these fixtures).
    point_partitions = {
        sf: _sweep_shuffle_partitions(sf_dir) for sf, sf_dir in points
    }
    scaled_partitions = _scaled_point_partitions(points) if sf3_only else {}
    print(
        f"shuffle partitions per point: {point_partitions}"
        + (f"; scaled (mass-growing queries): {scaled_partitions}"
           if sf3_only else ""),
        file=sys.stderr,
    )
    out: dict[str, dict[str, float]] = {}
    for name in queries:
        out[name] = {}
        for sf, sf_dir in points:
            sizing = (
                scaled_partitions
                if sf3_only and name in SF3_SCALED_QUERIES
                else point_partitions
            )
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(sizing[sf])
            )
            best = None
            for _ in range(2):  # best-of-2, same rationale as bench.py
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                sec = time.perf_counter() - t0
                best = sec if best is None else min(best, sec)
            out[name][sf] = round(best, 3)
        if "sf0.01" in out[name]:
            out[name]["growth_01_to_1"] = round(
                out[name]["sf0.1"] / max(out[name]["sf0.01"], 1e-9), 2
            )
        if "sf1" in out[name] and "sf0.1" in out[name]:
            out[name]["growth_1_to_10"] = round(
                out[name]["sf1"] / max(out[name]["sf0.1"], 1e-9), 2
            )
        if "sf3" in out[name]:
            # 3x data — a linear plan grows <= ~3x.
            out[name]["growth_sf1_to_sf3"] = round(
                out[name]["sf3"] / max(out[name]["sf1"], 1e-9), 2
            )
    if sf3_only:
        worst_key = "growth_sf1_to_sf3"
    elif "sf1" in out[queries[0]]:
        worst_key = "growth_1_to_10"
    else:
        worst_key = "growth_01_to_1"
    worst = max(v.get(worst_key, 0.0) for v in out.values())
    print(json.dumps({"queries": out, "worst_growth": worst}))


if __name__ == "__main__":
    main()
