"""Similarity search over embedding columns (array<float|double>).

Brute-force cosine top-k is the exact baseline (broadcast the query set,
JVM-side zip_with/aggregate arithmetic — no Python in the hot path).
The scale path is hyperplane-LSH bucketing: candidates from matching sign
buckets (multi-probe across several hash tables), exact re-rank inside.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hyperplanes(num_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes without RNG state:
    component = centered hash of (seed, plane, dim index)."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hash_u64(f"{seed}:{p}:{d}")
            row.append((h / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def hash_u64(s: str) -> int:
    import hashlib

    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[:8])[0]


def with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, v double[], norm) — cast once, norm once."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(F.col(id_col).alias("id"), v.alias("v")).withColumn(
        "norm", F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x))
    )


def cosine_expr(va: str, vb: str, na: str, nb: str):
    dot = F.aggregate(
        F.zip_with(F.col(va), F.col(vb), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return dot / (F.col(na) * F.col(nb))


def brute_force_topk(
    df: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k → (query_id, neighbor_id, rank, cosine).

    queries: subset DataFrame with the same (id_col, vec_col) schema.
    The query side is broadcast; the corpus streams through one pass.
    """
    corpus = with_norm(df, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    q = with_norm(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    cos = cosine_expr("va", "vb", "na", "nb")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        F.broadcast(q).join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def brute_force_topk_arrow(
    df: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul → same schema as
    brute_force_topk.

    The corpus is collected and broadcast as a normalized float64 matrix
    (scale bound: fits in executor memory — ~1 GB per 2M×64-dim vectors;
    beyond that, block the corpus and merge per-block top-k). Queries stream
    through mapInPandas; each Arrow batch is one BLAS matmul — the
    expression-tree form (zip_with + aggregate) evaluates interpreted
    per-pair and is ~50× slower on quadratic workloads.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    corpus_pdf = df.select(id_col, vec_col).toPandas()
    ids = corpus_pdf[id_col].to_numpy()
    C = np.array(corpus_pdf[vec_col].tolist(), dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((ids, C))

    def fn(batches):
        bids, bC = bc.value
        for pdf in batches:
            Q = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
            qids = pdf[id_col].to_numpy()
            S = Q @ bC.T
            out_q, out_n, out_r, out_c = [], [], [], []
            for row, qid in enumerate(qids):
                sims = S[row]
                mask = bids != qid
                cand_ids = bids[mask]
                cand_sims = sims[mask]
                # order by cosine desc, neighbor id asc (deterministic)
                order = np.lexsort((cand_ids, -cand_sims))[:k]
                for rank, j in enumerate(order, start=1):
                    out_q.append(qid)
                    out_n.append(cand_ids[j])
                    out_r.append(rank)
                    out_c.append(round(float(cand_sims[j]), 6))
            yield pd.DataFrame({
                "query_id": out_q, "neighbor_id": out_n,
                "rank": out_r, "cosine": out_c,
            })

    schema = "query_id long, neighbor_id long, rank long, cosine double"
    return queries.select(id_col, vec_col).mapInPandas(fn, schema)


def lsh_topk(
    df: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    num_planes: int = 6, num_tables: int = 4, seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via hyperplane LSH → same schema as
    brute_force_topk.

    num_tables independent sign-bucket tables; a corpus vector is a candidate
    if it shares a bucket with the query in ANY table. Candidate set size ≈
    corpus / 2^num_planes per table — tune num_planes to corpus size. The
    candidate join is an equi-join on (table, bucket): fully shuffled, never
    all-pairs, which is the property that survives a 100× scale-up.
    """
    dim = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0]["d"]

    def bucketize(e: DataFrame, prefix: str) -> DataFrame:
        parts = []
        for t in range(num_tables):
            planes = _hyperplanes(num_planes, dim, seed + 1000 * t)
            bucket = F.concat(*[
                F.when(
                    F.aggregate(
                        F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in p]),
                                   lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x,
                    ) >= 0, F.lit("1")
                ).otherwise(F.lit("0"))
                for p in planes
            ])
            parts.append(e.select(
                F.col("id").alias(f"{prefix}_id"), F.col("v").alias(f"{prefix}_v"),
                F.col("norm").alias(f"{prefix}_n"),
                F.lit(t).alias("table"), bucket.alias("bucket"),
            ))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    corpus = bucketize(with_norm(df, id_col, vec_col), "c")
    q = bucketize(with_norm(queries, id_col, vec_col), "q")
    cands = (
        q.join(corpus, ["table", "bucket"])
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"),
            "q_v", "c_v", "q_n", "c_n",
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = cosine_expr("q_v", "c_v", "q_n", "c_n")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cands.withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
