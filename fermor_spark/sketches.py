"""Approximate sketch operators for 100 TB-scale profiling: HyperLogLog
distinct counts, count-min-sketch heavy hitters, approximate quantiles.

These wrap Spark's built-in sketch aggregates (JVM-side, mergeable across
partitions — the property that matters at scale: each executor builds a
partial sketch, the driver merges fixed-size state instead of shuffling
raw values). Error bounds are checked against exact answers in tests;
no SQL oracles (approximate by design — the driver records rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, cols: list[str], rsd: float = 0.05) -> DataFrame:
    """Per-column HyperLogLog distinct estimates → one row of estimates."""
    return df.agg(*[
        F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_distinct") for c in cols
    ])


def approx_distinct_by_key(df: DataFrame, key: str, value: str,
                           rsd: float = 0.05) -> DataFrame:
    """(key, approx distinct values) — e.g. distinct users per event type."""
    return df.groupBy(key).agg(
        F.approx_count_distinct(value, rsd=rsd).alias(f"approx_{value}_distinct")
    )


def approx_quantiles(df: DataFrame, col: str, probs: list[float],
                     accuracy: int = 10000) -> list[float]:
    """Approximate quantiles via the Greenwald-Khanna sketch
    (percentile_approx) — single pass, mergeable."""
    row = df.agg(
        F.percentile_approx(col, probs, accuracy).alias("q")
    ).collect()[0]
    return list(row["q"])


def _murmur3_x86_32(data: bytes, seed: int) -> int:
    """Murmur3_x86_32 exactly as Spark's implementation computes it over a
    byte[]: 4-byte little-endian words through the standard rounds, then
    the tail bytes SIGN-EXTENDED and each run through a full mixK1+mixH1
    round (Spark's hashUnsafeBytes — deliberately not the reference
    murmur3 tail), then fmix over the total length. Public algorithm
    (Appleby) + public Spark variant; needed to probe Spark-built
    count-min sketches without the JVM estimate function."""
    M = 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & M
    n = len(data) - (len(data) % 4)
    for i in range(0, n, 4):
        k1 = int.from_bytes(data[i:i + 4], "little")
        k1 = (k1 * c1) & M
        k1 = ((k1 << 15) | (k1 >> 17)) & M
        k1 = (k1 * c2) & M
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & M
        h1 = (h1 * 5 + 0xE6546B64) & M
    for i in range(n, len(data)):
        b = data[i]
        if b > 127:                      # Java byte → int sign extension
            b -= 256
        k1 = (b * c1) & M
        k1 = ((k1 << 15) | (k1 >> 17)) & M
        k1 = (k1 * c2) & M
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & M
        h1 = (h1 * 5 + 0xE6546B64) & M
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1    # as Java int


def cms_estimate(sketch: bytes, item: str) -> int:
    """Estimate an item's frequency from a Spark-serialized count-min
    sketch (the BINARY produced by F.count_min_sketch) without the JVM.

    Format (big-endian, Spark's CountMinSketchImpl.writeTo — public):
    version:int32 = 1, totalCount:int64, depth:int32, width:int32,
    hashA:int64[depth] (random multipliers for the integral-item path —
    unused for string/binary items), then depth×width int64 counters
    row-major. String/binary bucket selection (CountMinSketchImpl
    .getHashBuckets) is double hashing with FIXED murmur seeds — the
    user-supplied sketch seed only feeds hashA: hash1 = murmur(bytes, 0),
    hash2 = murmur(bytes, hash1), bucket_i = Math.abs((hash1 + i·hash2)
    % width) for i in 0..depth-1, with Java 32-bit wrapping and Java's
    sign-follows-dividend %. Validated in tests: estimates over planted
    skewed data exactly equal true counts (width ≫ items ⇒ no
    collisions), which only happens if every bucket matches the JVM's
    add-time buckets."""
    import struct

    version, _total, depth, width = struct.unpack_from(">iqii", sketch, 0)
    if version != 1:
        raise ValueError(f"unsupported CMS serialization version {version}")
    table = struct.unpack_from(f">{depth * width}q", sketch, 20 + 8 * depth)
    b = item.encode("utf-8")
    h1 = _murmur3_x86_32(b, 0)
    h2 = _murmur3_x86_32(b, h1 & 0xFFFFFFFF)
    est = None
    for i in range(depth):
        h = (h1 + i * h2) & 0xFFFFFFFF          # Java int wrap
        if h >= (1 << 31):
            h -= 1 << 32
        r = abs(h) % width                       # Java %: |rem| then abs()
        c = table[i * width + r]
        est = c if est is None else min(est, c)
    return int(est)


def heavy_hitters(df: DataFrame, col: str, min_share: float = 0.01,
                  eps: float = 0.001, confidence: float = 0.99,
                  seed: int = 42) -> DataFrame:
    """Items whose frequency exceeds min_share of rows, with CMS-estimated
    counts → (item, approx_count).

    Two passes: a count-min-sketch pass builds the mergeable frequency
    sketch; candidate items from a single-pass frequent-items sketch
    (freqItems, candidate count bounded by 1/min_share — NOT a full
    distinct of the column, which on a high-cardinality column would
    shuffle every distinct value) are then probed against it. freqItems
    may return false positives; the CMS probe + min_share filter drops
    them. CMS guarantees estimate ∈ [true, true + eps·N] at the given
    confidence; min_share ≫ eps keeps false positives out. The probe uses
    the JVM count_min_sketch_estimate when the build has it, else the
    pure-Python cms_estimate reader over the same serialized sketch —
    driver-side over ≤ 1/min_share candidates, never the raw data."""
    total = df.count()
    sketch_row = df.agg(
        F.count_min_sketch(F.col(col).cast("string"), F.lit(eps), F.lit(confidence),
                           F.lit(seed)).alias("cms")
    ).collect()[0]
    sketch = bytes(sketch_row["cms"])
    spark = df.sparkSession
    cand_vals = (
        df.select(F.col(col).cast("string").alias("item"))
        .stat.freqItems(["item"], support=max(min_share, 1e-4))
        .collect()[0][0]
    )
    cand_vals = [v for v in cand_vals if v is not None]
    if _has_cms_estimate(spark):
        candidates = spark.createDataFrame([(v,) for v in cand_vals], "item string")
        sk = spark.createDataFrame([(sketch,)], "cms binary")
        probed = candidates.crossJoin(F.broadcast(sk)).select(
            "item",
            F.expr("count_min_sketch_estimate(cms, item)").alias("approx_count"),
        )
    else:
        probed = spark.createDataFrame(
            [(v, cms_estimate(sketch, v)) for v in cand_vals],
            "item string, approx_count long",
        )
    return probed.where(F.col("approx_count") >= min_share * total)


def _has_cms_estimate(spark) -> bool:
    # catalog lookup, not a trial SQL execution — the latter logs an
    # ERROR-level UNRESOLVED_ROUTINE line on builds without the function
    try:
        return spark.catalog.functionExists("count_min_sketch_estimate")
    except Exception:
        return False


