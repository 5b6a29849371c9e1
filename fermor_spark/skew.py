"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join handling (on by default in fermor_spark.session) splits
oversized SHUFFLE partitions at runtime; these helpers cover the cases AQE
can't fix:
- a groupBy where one key dominates (two-stage salted aggregation);
- a join where the hot keys live on the BUILD side of a non-broadcastable
  join (explicit salt column + replicated other side).

Reference scope note: the reference engine is single-node and has no skew
concept; this is part of the engine's 100 TB surface (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, keys: list[str], salt: int = 16) -> DataFrame:
    """Two-stage count aggregation: groupBy (keys, salt) → partial counts →
    groupBy keys → sum. A hot key's rows spread across `salt` reducers in
    stage one instead of landing on a single straggler."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("count"))


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, str],
               salt: int = 16) -> DataFrame:
    """Two-stage aggregation for decomposable aggregates.

    aggs: {column: 'sum'|'count'|'min'|'max'}. Non-decomposable aggregates
    (avg, distinct) must be rewritten by the caller (avg = sum/count).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    stage1 = []
    stage2 = []
    for c, fn in aggs.items():
        alias = f"{fn}_{c}"
        if fn == "count":
            stage1.append(F.count(c).alias(alias))
            stage2.append(F.sum(alias).alias(alias))
        elif fn == "sum":
            stage1.append(F.sum(c).alias(alias))
            stage2.append(F.sum(alias).alias(alias))
        elif fn == "min":
            stage1.append(F.min(c).alias(alias))
            stage2.append(F.min(alias).alias(alias))
        elif fn == "max":
            stage1.append(F.max(c).alias(alias))
            stage2.append(F.max(alias).alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = salted.groupBy(*keys, "_salt").agg(*stage1)
    return partial.groupBy(*keys).agg(*stage2)


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the skewed side's key, replicate the other
    side once per salt value, join on (key, salt).

    Use when the non-skewed side is too large to broadcast but small enough
    to replicate `salt`×; a hot key's rows then spread over `salt` tasks.
    Output columns = skewed's + other's (key deduplicated).

    Only skewed-side-preserving join types are valid: `other` is replicated
    `salt`×, so right/full joins would emit `salt` null-extended duplicates
    per unmatched other-side row.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r} "
            "(the replicated side would duplicate unmatched rows)"
        )
    s = skewed.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    salts = skewed.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
    o = other.crossJoin(salts)
    out = s.join(o, [key, "_salt"], how)
    return out.drop("_salt")
