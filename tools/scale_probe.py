#!/usr/bin/env python3
"""Design-for-100x scale probe: replicate the sf0.1 tables to 2x/4x/8x
on disk (structure-preserving key offsets for the graph tables; salted
texts for documents so shingle volume grows linearly instead of
collapsing into total duplication), run a cross-section of headline
operators at each multiplier, and report how runtime scales at fixed
parallelism (local[32]).

What "good" looks like: shuffle-bound operators (exact dedup, MinHash
banding, graph build) scale ~linearly in input size once past the
scheduler floor; nothing OOMs; no operator goes super-linear (a
super-linear line means a bucket/candidate-set is growing
quadratically and would NOT survive the next 100x).

Usage:
    python tools/scale_probe.py [--multipliers 1 2 4 8]
                                [--sf-dir /root/testdata/sf0.1]
                                [--work-dir /tmp/fermor_scale_probe]

Prints one JSON line per (op, multiplier) and a final summary with the
fitted scaling exponent per op (log-log slope). Results are recorded in
PLANS.md.
"""

from __future__ import annotations

import argparse
import gc
import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRAPH_TABLES = {
    # table -> column -> the ENTITY whose PK stride offsets it. Every
    # occurrence of an entity's key — PK and FKs alike — must shift by
    # the SAME per-replica stride (the entity PK's max + 1) or replica
    # FKs point at the wrong rows and the graph distorts per multiplier.
    # region/nation stay shared: dims stay, facts grow — the realistic
    # shape of a growing corpus/graph.
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
}

_ENTITY_PK = {"customer": "c_custkey", "supplier": "s_suppkey",
              "part": "p_partkey", "orders": "o_orderkey"}


def replicate(spark, sf_dir: str, out_dir: str, m: int) -> None:
    """Write an m-fold structure-preserving replication of the graph
    tables + documents into out_dir (region/nation copied through)."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{out_dir}/{t}.parquet")
    # every max is coalesced to 0: an empty table (degenerate-input runs)
    # would otherwise abort the whole replication with None + 1
    stride = {
        ent: spark.read.parquet(f"{sf_dir}/{ent}.parquet")
        .agg(F.coalesce(F.max(pk), F.lit(0))).collect()[0][0] + 1
        for ent, pk in _ENTITY_PK.items()
    }
    for t, keys in GRAPH_TABLES.items():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        parts = []
        for r in range(m):
            rep = df
            for k, ent in keys.items():
                rep = rep.withColumn(k, F.col(k) + F.lit(r * stride[ent]))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    off = d.agg(F.coalesce(F.max("doc_id"), F.lit(0))).collect()[0][0] + 1
    parts = []
    for r in range(m):
        rep = d.withColumn("doc_id", F.col("doc_id") + F.lit(r * off))
        if r > 0:
            # salt the first token so replicas are near-dups of the
            # original, not byte-identical copies: shingle volume and
            # LSH bucket sizes grow linearly, the near-dup relation
            # stays detectable
            rep = rep.withColumn(
                "text",
                F.concat(F.lit(f"r{r} "), F.col("text")))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eoff = e.agg(F.coalesce(F.max("vec_id"), F.lit(0))).collect()[0][0] + 1
    _edim_row = e.select(F.size("embedding").alias("d")).limit(1).collect()
    edim = _edim_row[0]["d"] if _edim_row else 2
    parts = []
    for r in range(m):
        rep = e.withColumn("vec_id", F.col("vec_id") + F.lit(r * eoff))
        if r > 0:
            # roll the vector by r dims: replica populations are NOT
            # near-dups of the originals (cosine to the unrolled vector
            # is ~random), so near-pair volume and LSH bucket sizes grow
            # LINEARLY with m — byte-identical replicas would grow every
            # identical-copy bucket m-fold and candidate pairs m^2-fold,
            # a data artifact that would mask the operator's true slope
            # roll by 1..edim-1 (never 0: r % edim would hand replica
            # r=edim a byte-identical copy and reintroduce the m^2
            # artifact); once rolls exhaust (m > edim), negate the
            # second cycle — cosine to the same-roll replica is -1,
            # still not a near-dup at positive thresholds
            k = 1 + (r - 1) % (edim - 1)
            rep = rep.withColumn(
                "embedding",
                F.concat(F.slice("embedding", k + 1, edim - k),
                         F.slice("embedding", 1, k)))
            if ((r - 1) // (edim - 1)) % 2 == 1:
                rep = rep.withColumn(
                    "embedding",
                    F.transform("embedding", lambda x: -x))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev_off = {c: ev.agg(F.coalesce(F.max(c), F.lit(0))).collect()[0][0] + 1
              for c in ("event_id", "user_id")}
    parts = []
    for r in range(m):
        # user_id strides with the replica: sessions/as-of state stays
        # per-user-sized (the realistic growth shape — more users, not
        # infinitely long per-user histories); timestamps unchanged, so
        # window/session counts per user replicate exactly
        parts.append(ev.withColumn(
            "event_id", F.col("event_id") + F.lit(r * ev_off["event_id"])
        ).withColumn(
            "user_id", F.col("user_id") + F.lit(r * ev_off["user_id"])))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def op_graph_build(spark, sf_dir: str) -> int:
    """Star-graph construction + full edge count (one action) — the
    reference's own absolute baseline claim is 1-10M elements < 10 s."""
    from fermor_spark import datasets

    # bypass the per-sf_dir graph cache: construction IS the measurement
    datasets._graph_cache.pop(
        (spark.sparkContext.applicationId, sf_dir), None)
    g = datasets.star_graph(spark, sf_dir)
    return g.edges().count()


def op_bfs_2hop(spark, sf_dir: str) -> int:
    """customer -> nation -> region 2-hop expansion, counted (the
    g_2hop_region traversal shape over the replicated graph)."""
    from fermor_spark import datasets

    g = datasets.star_graph(spark, sf_dir)
    return g.vertices("customer").out("in_nation").out("in_region").count()


def op_exact_dedup(spark, sf_dir: str) -> int:
    from pyspark.sql import functions as F

    from fermor_spark.pipeline.dedup import exact_dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(d, ["text"], ["doc_id"]).count()


def op_minhash_pairs(spark, sf_dir: str) -> int:
    from fermor_spark.pipeline.dedup import minhash_dedup_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return minhash_dedup_pairs(d, "doc_id", "text").count()


def op_incr_minhash(spark, sf_dir: str) -> int:
    from pyspark.sql import functions as F

    from fermor_spark.pipeline.dedup import incremental_minhash_dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    new = d.where(F.col("doc_id") % 8 == 1).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text")
    corpus = d.where(F.col("doc_id") % 8 != 1)
    return incremental_minhash_dedup(new, corpus, "doc_id", "text").count()


def op_embed_buckets(spark, sf_dir: str) -> int:
    """Hyperplane-LSH sign bucketing (the r13 Arrow-matmul kernel) — a
    pure map-side projection, so the slope should be ~1 in rows with no
    shuffle component at all."""
    from fermor_spark.pipeline.dedup import embedding_buckets

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_buckets(e, "vec_id", "embedding").count()


def op_incr_semantic(spark, sf_dir: str) -> int:
    """Incremental semantic dedup (bucket equi-join + exact-cosine
    verify), snapshot-vs-corpus split the way op_incr_minhash does it."""
    from pyspark.sql import functions as F

    from fermor_spark.pipeline.dedup import incremental_embedding_dedup

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    new = e.where(F.col("vec_id") % 8 == 1).select(
        (F.col("vec_id") + 1_000_000_000).alias("vec_id"), "embedding")
    corpus = e.where(F.col("vec_id") % 8 != 1)
    return incremental_embedding_dedup(
        new, corpus, "vec_id", "embedding").count()


def op_quantized_topk(spark, sf_dir: str) -> int:
    """int8-quantize the replicated corpus (the r13 Arrow kernel) and run
    the exact blocked-BLAS top-k for a fixed 10-query set: quantize is a
    map-side pass (slope ~1 in rows), search grows linearly in corpus
    blocks for a fixed query set."""
    from pyspark.sql import functions as F

    from fermor_spark.pipeline.similarity import quantized_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 10)
    return quantized_topk(e, q, k=5).count()


def op_simhash_pairs(spark, sf_dir: str) -> int:
    """SimHash near-dup candidates over the salted near-dup replicas —
    like the minhash probe, adversarial for banding: every original gains
    m-1 near-dup replicas, so TRUE pair volume grows ~m² while the banded
    equi-join must stay bucket-bounded."""
    from fermor_spark.pipeline.dedup import simhash_near_dup_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return simhash_near_dup_pairs(d, "doc_id", "text", max_hamming=8).count()


def op_sessions(spark, sf_dir: str) -> int:
    """Batch sessionization (session_window, 30-min gap) over the
    replicated events — user-keyed shuffle + per-user session merge;
    rows grow linearly (users stride per replica)."""
    from fermor_spark import queries as Q

    return Q.QUERIES["events_sessions_30m"](spark, sf_dir).count()


def op_asof_join(spark, sf_dir: str) -> int:
    """As-of join (purchases pick up the most recent prior click per
    user) over the replicated events — the union-tag + running-last
    window shape, ONE user-keyed shuffle."""
    from fermor_spark import queries as Q

    return Q.QUERIES["events_asof_prior_click"](spark, sf_dir).count()


OPS = {
    "graph_build": op_graph_build,
    "bfs_2hop": op_bfs_2hop,
    "exact_dedup": op_exact_dedup,
    "minhash_pairs": op_minhash_pairs,
    "incr_minhash": op_incr_minhash,
    "embed_buckets": op_embed_buckets,
    "incr_semantic": op_incr_semantic,
    "quantized_topk": op_quantized_topk,
    "simhash_pairs": op_simhash_pairs,
    "sessions": op_sessions,
    "asof_join": op_asof_join,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multipliers", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/fermor_scale_probe")
    ap.add_argument("--ops", nargs="+", default=list(OPS),
                    choices=list(OPS))
    ap.add_argument("--runs", type=int, default=2,
                    help="timed runs per (op, multiplier); best is kept")
    args = ap.parse_args()

    from fermor_spark.session import get_spark, release_caches

    spark = get_spark(app_name="scale-probe")
    dirs = {}
    for m in args.multipliers:
        out = os.path.join(args.work_dir, f"mult{m}")
        # _SUCCESS, not bare directory existence: an interrupted prior
        # write leaves a partial dataset a later run must not reuse.
        # events.parquet is the LAST table replicate() writes, so its
        # marker implies the full set (and invalidates replica dirs that
        # predate embedding/events replication)
        if not os.path.exists(
                os.path.join(out, "events.parquet", "_SUCCESS")):
            print(f"replicating x{m} -> {out}", file=sys.stderr)
            replicate(spark, args.sf_dir, out, m)
        dirs[m] = out

    results: dict = {op: {} for op in args.ops}
    for op in args.ops:
        fn = OPS[op]
        for m in args.multipliers:
            best, rows = None, None
            for _ in range(args.runs):
                gc.collect()
                spark.sparkContext._jvm.System.gc()
                t0 = time.time()
                rows = fn(spark, dirs[m])
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                release_caches()
            results[op][m] = (round(best, 2), rows)
            print(json.dumps({"op": op, "mult": m,
                              "sec": round(best, 2), "rows": rows}),
                  flush=True)

    print("\nop                mult:sec ...   log-log slope (1.0 = linear)")
    for op in args.ops:
        ms = sorted(results[op])
        if len(ms) >= 2:
            xs = [math.log(m) for m in ms]
            ys = [math.log(max(results[op][m][0], 1e-3)) for m in ms]
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
                max(sum((x - mx) ** 2 for x in xs), 1e-9)
        else:
            slope = float("nan")
        line = "  ".join(f"x{m}:{results[op][m][0]}s" for m in ms)
        print(f"{op:<17} {line}   slope={slope:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
