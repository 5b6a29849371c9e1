"""Deterministic sampling/splitting/mixing (pipeline.sample).

The load-bearing property is reproducibility: membership is a pure function
of (seed, id), so it must survive repartitioning, re-evaluation, and scale —
exactly what Spark's RNG-based df.sample does not guarantee.
"""

from pyspark.sql import functions as F

from fermor_spark.pipeline.sample import (
    hash_bucket,
    hash_split,
    stratified_hash_sample,
    weighted_mix,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("stratum"),
    )


def test_hash_split_stable_under_repartition(spark):
    d = _docs(spark)
    s1 = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    s2 = hash_split(d.repartition(13), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    r1 = {r[0]: r[1] for r in s1.select("doc_id", "split").collect()}
    r2 = {r[0]: r[1] for r in s2.select("doc_id", "split").collect()}
    assert r1 == r2


def test_hash_split_proportions_and_total(spark):
    d = _docs(spark)
    counts = {
        r[0]: r[1]
        for r in hash_split(d, "doc_id", {"train": 8, "val": 1, "test": 1})
        .groupBy("split").count().collect()
    }
    assert sum(counts.values()) == 2000  # total preserved, no row dropped
    assert set(counts) == {"train", "val", "test"}
    # 2000 rows, 80/10/10: binomial 5-sigma bounds
    assert 1500 < counts["train"] < 1560 + 250
    assert 100 < counts["val"] + counts["test"] < 600


def test_split_membership_grows_monotonically(spark):
    # adding rows must never reassign existing ids
    small = hash_split(_docs(spark, 500), "doc_id", {"a": 1, "b": 1})
    big = hash_split(_docs(spark, 2000), "doc_id", {"a": 1, "b": 1})
    sm = {r[0]: r[1] for r in small.select("doc_id", "split").collect()}
    bg = {r[0]: r[1] for r in big.select("doc_id", "split").collect()}
    assert all(bg[k] == v for k, v in sm.items())


def test_stratified_fractions(spark):
    d = _docs(spark)
    kept = stratified_hash_sample(
        d, "doc_id", "stratum", {"0": 0.5, "1": 0.0}, default_fraction=1.0
    )
    by = {r[0]: r[1] for r in kept.groupBy("stratum").count().collect()}
    assert by.get("1", 0) == 0          # dropped stratum
    assert by["2"] == 666               # default 1.0 keeps everything
    assert 260 < by["0"] < 410          # ~50% of 667


def test_weighted_mix_tags_and_independence(spark):
    d = _docs(spark)
    a = d.where(F.col("stratum") == "0")
    b = d.where(F.col("stratum") != "0")
    out = weighted_mix({"a": (a, 1.0), "b": (b, 0.5)}, "doc_id")
    by = {r[0]: r[1] for r in out.groupBy("mix_source").count().collect()}
    assert by["a"] == 667               # fraction 1.0 keeps all
    assert 560 < by["b"] < 770          # ~50% of 1333
    # tagged rows are disjoint id sets (sources were disjoint)
    assert out.select("doc_id").distinct().count() == out.count()


def test_hash_bucket_range(spark):
    d = _docs(spark, 200)
    mm = d.select(hash_bucket("doc_id", "s").alias("b")).agg(
        F.min("b"), F.max("b")
    ).collect()[0]
    assert 0 <= mm[0] and mm[1] < 1_000_000
