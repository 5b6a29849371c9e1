"""Corpus profiling: the "know your data" pass a pipeline runs before
and after curation — per-group volume, mass, duplication, and length
distribution in ONE aggregation.

Scale shape: a single groupBy over the grouping column; every metric is
a JVM aggregate — exact count/sum, HyperLogLog distinct (mergeable
fixed-size state per executor), and Greenwald-Khanna percentiles
(single-pass mergeable sketch) — so profiling 100 TB costs one shuffle
of partial aggregate states, never a second scan and never raw-value
movement. Duplication is measured as distinct text hashes vs rows: an
exact-dup-free corpus profiles at dup_ratio ≈ 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_corpus(df: DataFrame, group_col: str = "lang",
                   text_col: str = "text", rsd: float = 0.05,
                   quantile_accuracy: int = 10000) -> DataFrame:
    """Per-``group_col`` profile: n_docs, total_chars, approx distinct
    texts (HLL over xxhash64 — duplication estimate), exact distinct
    (for the HLL error contract downstream checks may assert), and
    p50/p90 character lengths (GK sketch + exact median for the rank
    contract). Columns: group, n_docs, total_chars, distinct_exact,
    distinct_approx, p50_chars, p90_chars."""
    length = F.length(text_col)
    th = F.xxhash64(text_col)
    return df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("n_docs"),
        F.sum(length).alias("total_chars"),
        F.countDistinct(th).alias("distinct_exact"),
        F.approx_count_distinct(th, rsd=rsd).alias("distinct_approx"),
        F.percentile_approx(length, 0.5, quantile_accuracy)
        .alias("p50_chars"),
        F.percentile_approx(length, 0.9, quantile_accuracy)
        .alias("p90_chars"),
    )
