"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full pipeline runs, no driver
collect cost). The star-graph build/cache is timed separately as
`graph_build` — it is the amortized `forked()` boundary every graph query
shares.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fermor_spark import get_spark  # noqa: E402
from fermor_spark import queries as q  # noqa: E402
from fermor_spark.datasets import star_graph  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top3_orders_per_customer",
    "events_tumbling_hour",
    "events_sessions_30m",
    "g_out_nation",
    "g_2hop_region",
    "g_lookahead_big_buyers",
    "g_recommender",
    "g_reachable_from_region",
    "g_connected_components",
    "text_quality",
    "text_lang_id",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_fingerprint_overlap",
    "ann_topk_cosine",
    "ann_nearest_neighbor_all",
    "rollup_order_totals",
    "median_price_by_status",
    # r2 additions (keys above stay stable for round-over-round comparison)
    "q6_revenue_forecast",
    "window_lag_user_delta",
    "sample_split_counts",
    "text_repetition",
    "pipeline_curation_funnel",
    "dedup_embedding_cosine",
    "decontaminate_overlap",
    # r4 additions: iterative graph operators carry perf evidence too
    "g_pagerank_supply",
    "g_kcore_ring_chains",
    "events_asof_prior_click",
    "events_range_nearby_counts",
    # r5 additions
    "g_scc_nation_ring",
    "q9_product_profit",
    "q18_large_volume_customers",
    "sketch_hll_distinct",
    "multimodal_wav_features",
    "g_shortest_path_weighted",
    "text_chunk_windows",
    "skew_salted_join_brands",
    "text_bigram_logprob",
    "text_bpe_token_count",
    "ann_quantized_topk",
    # r6 additions: TPC-H completions, TF-IDF, the progressive-JPEG decode
    # contract, and one forced-distributed hybrid leg (the local-finish
    # hybrids' distributed rounds otherwise never appear at bench SF)
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_relationship",
    "q20_potential_promotion",
    "text_tfidf_topterms",
    "multimodal_progressive_jpeg",
    "multimodal_lossless_jpeg",
    "multimodal_video_metadata",
    "multimodal_audio_metadata",
    "pipeline_jsonl_roundtrip",
    "text_gopher_quality",
    "text_gopher_repetition",
    "text_c4_filters",
    "dedup_lines_c4",
    "dedup_cut_spans",
    "dedup_duplicated_spans",
    "g_cc_distributed",
    # r7 additions: the remaining forced-distributed hybrid legs, so every
    # hybrid's distributed path carries perf telemetry (their LAST_*_ROUNDS
    # land in the "rounds" block because they run AFTER the local-finish
    # hybrids of the same family)
    "g_scc_distributed",
    "g_kcore_distributed",
    # real Structured-Streaming execution (availableNow drain to memory):
    # state store + watermark + no-data flush batch, not the batch analog
    "events_streaming_tumbling",
    "events_streaming_file_sink",
    "events_funnel_conversion",
    "events_retention_cohorts",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _bench_bucketed_traversal(spark, timings: dict[str, float]) -> None:
    """End-to-end persisted-bucketed path: save the star graph with
    src-bucketed edges (one-time ETL, untimed — it is the amortized cost a
    production deployment pays once), load it back as a table, and time a
    2-hop traversal. The bucketed side of each src-keyed hop join reads
    pre-shuffled, so only the (small) frontier exchanges."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from fermor_spark.graph import PropertyGraph

    tmp = tempfile.mkdtemp(prefix="fermor_bench_bucketed_")
    path = f"{tmp}/bg"
    name = "fermor_edges_" + path.strip("/").replace("/", "_").replace("-", "_").replace(".", "_")
    try:
        g = star_graph(spark, SF_DIR)
        g.save(path, bucket_by_src=16)
        e = spark.table(name)
        v = spark.read.parquet(f"{path}/vertices")
        gb = PropertyGraph.from_dataframes(spark, e, v)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            cust = gb.vertices("customer")
            tagged = cust._with(cust.df.withColumn("_c", F.col("id")))
            out = tagged.out("in_nation").out("in_region").df.select(
                F.col("_c").alias("c_id"), F.col("id").alias("r_id")
            )
            _force(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings["g_2hop_bucketed"] = round(best, 3)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="fermor-bench")
    timings: dict[str, float] = {}

    # warm the JVM (codegen, JIT, shuffle machinery) on a throwaway job so
    # graph_build measures build throughput, not cold-start — ~4s of the
    # previous graph_build number was JVM boot. Also pre-read every input
    # table once (untimed): graph_build is a ONE-SHOT measurement (the
    # fixture caches per session), so cold page-cache reads and shared-VM
    # disk contention would otherwise land entirely on it.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fermor_spark.datasets import TABLES, table
    for t in TABLES:
        table(spark, SF_DIR, t).count()

    t0 = time.perf_counter()
    g = star_graph(spark, SF_DIR)
    g.E.count()  # materialize the cached edge table
    g.V.count()
    timings["graph_build"] = round(time.perf_counter() - t0, 3)

    from fermor_spark.session import release_caches

    registry = q.all_queries()
    for name in BENCH_QUERIES:
        # one UNTIMED warm-up run, then best of three timed runs. Best-of-N
        # is defined to measure the steady-state plan, but r6 proved N=3
        # alone doesn't reach it under the shared VM: the warm-up run pays
        # codegen/Arrow-worker spin-up AND the query's managed-cache
        # materialization, which for the cache-building ANN/dedup family ate
        # runs 1-2 outright (driver-recorded 8.04/5.33/2.69 s for
        # ann_nearest_neighbor_all/dedup_minhash_lsh/ann_topk_cosine vs
        # 1.27/1.63/0.78 s measured steady states — run sequences like
        # 16.4 -> 11.2 -> 1.6 never warmed within three runs). The timed
        # minimum still absorbs shared-VM interference.
        best = None
        for i in range(4):
            t0 = time.perf_counter()
            _force(registry[name](spark, SF_DIR))
            dt = time.perf_counter() - t0
            if i == 0:
                continue  # warm-up: codegen + cache build, never recorded
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        # cache hygiene BETWEEN queries (never between a query's own three
        # runs, so its warm state is measured): operators register
        # query-scoped caches via session.managed_cache; leaving them
        # accumulating across 40+ queries drove storage eviction that
        # defeated every later cache (r5: text_fingerprint_overlap measured
        # 5.2 s best-of-3 vs 0.6 s solo-warm). Each query now warms and
        # releases its OWN caches — inherited-cache contamination shows up
        # as its own line instead of mystery noise.
        release_caches()

    _bench_bucketed_traversal(spark, timings)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    # iteration round counts for the driver-loop operators, so a
    # round-count regression is visible in the bench record without rerun
    from fermor_spark import iterate as it
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rounds": {"cc": it.LAST_CC_ROUNDS, "kcore": it.LAST_KCORE_ROUNDS,
                   "scc": it.LAST_SCC_ROUNDS, "bf": it.LAST_BF_ROUNDS,
                   "bfs": it.LAST_BFS_ROUNDS},
    }))


if __name__ == "__main__":
    main()
