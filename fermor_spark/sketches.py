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
    confidence; min_share ≫ eps keeps false positives out.
    """
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
    candidates = spark.createDataFrame(
        [(v,) for v in cand_vals if v is not None], "item string"
    )
    sk = spark.createDataFrame([(sketch,)], "cms binary")
    probed = candidates.crossJoin(F.broadcast(sk)).select(
        "item",
        F.expr("count_min_sketch_estimate(cms, item)").alias("approx_count"),
    ) if _has_cms_estimate(spark) else _exact_fallback(df, col)
    return probed.where(F.col("approx_count") >= min_share * total)


def _has_cms_estimate(spark) -> bool:
    # catalog lookup, not a trial SQL execution — the latter logs an
    # ERROR-level UNRESOLVED_ROUTINE line on builds without the function
    try:
        return spark.catalog.functionExists("count_min_sketch_estimate")
    except Exception:
        return False


def _exact_fallback(df: DataFrame, col: str) -> DataFrame:
    return df.groupBy(F.col(col).cast("string").alias("item")).agg(
        F.count("*").alias("approx_count")
    )
