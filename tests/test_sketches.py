"""Sketch operators: error-bounded against exact answers on real testdata."""

import pytest
from pyspark.sql import functions as F

from fermor_spark import sketches
from fermor_spark.datasets import table

SF = "/root/testdata/sf0.01"


def test_approx_distinct(spark):
    li = table(spark, SF, "lineitem")
    est = sketches.approx_distinct(li, ["l_orderkey", "l_partkey"]).collect()[0]
    exact_o = li.select("l_orderkey").distinct().count()
    exact_p = li.select("l_partkey").distinct().count()
    assert abs(est["l_orderkey_distinct"] - exact_o) / exact_o < 0.1
    assert abs(est["l_partkey_distinct"] - exact_p) / exact_p < 0.1


def test_approx_distinct_by_key(spark):
    ev = table(spark, SF, "events")
    est = {r["event_type"]: r["approx_user_id_distinct"] for r in
           sketches.approx_distinct_by_key(ev, "event_type", "user_id").collect()}
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    for k, v in exact.items():
        assert abs(est[k] - v) / max(v, 1) < 0.15, k


def test_approx_quantiles(spark):
    o = table(spark, SF, "orders")
    qs = sketches.approx_quantiles(o, "o_totalprice", [0.5, 0.9])
    exact = o.agg(F.percentile("o_totalprice", F.lit(0.5)).alias("m"),
                  F.percentile("o_totalprice", F.lit(0.9)).alias("p")).collect()[0]
    assert abs(qs[0] - exact["m"]) / exact["m"] < 0.05
    assert abs(qs[1] - exact["p"]) / exact["p"] < 0.05


def test_heavy_hitters(spark):
    ev = table(spark, SF, "events")
    hh = {r["item"]: r["approx_count"] for r in
          sketches.heavy_hitters(ev, "event_type", min_share=0.05).collect()}
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    total = sum(exact.values())
    for item, n in exact.items():
        if n >= 0.06 * total:
            assert item in hh, item
    for item, est in hh.items():
        # CMS never underestimates; overestimate bounded by eps*N
        assert est >= exact.get(item, 0)
        assert est <= exact.get(item, 0) + 0.002 * total


def test_cms_estimate_matches_jvm_buckets(spark):
    # the pure-Python prober must read the EXACT buckets the JVM wrote:
    # width >> items means zero collisions, so any hashing/offset drift
    # shows up as an estimate below the true count
    items = [(f"item-{i}é" * (1 + i % 3), 1 + i * 7) for i in range(40)]
    rows = [(s,) for s, c in items for _ in range(c)]
    df = spark.createDataFrame(rows, "v string")
    for seed in (42, 7):
        sk = bytes(df.agg(F.count_min_sketch(
            "v", F.lit(0.0001), F.lit(0.999), F.lit(seed)).alias("c")
        ).collect()[0]["c"])
        for s, c in items:
            assert sketches.cms_estimate(sk, s) == c, (seed, s)
        assert sketches.cms_estimate(sk, "never-seen-item") == 0


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Bloom over planted urls: zero false negatives (hard guarantee),
    false-positive rate within 3x of the build fpp on disjoint probes,
    via both the pure-Python probe and the broadcast column probe."""
    items = [(f"url-{i}",) for i in range(2000)]
    df = spark.createDataFrame(items, "u string").repartition(40)
    b = sketches.bloom_build(df, "u", expected_items=2000, fpp=0.01)
    assert all(sketches.bloom_contains(b, f"url-{i}") for i in range(2000))
    fps = sum(sketches.bloom_contains(b, f"other-{i}") for i in range(5000))
    assert fps <= 3 * 0.01 * 5000
    probe = spark.createDataFrame(
        [(f"url-{i}",) for i in range(3000)], "u string")
    got = sketches.bloom_member_col(probe, "u", b).toPandas()
    hits = set(got[got.bloom_hit]["u"])
    assert all(f"url-{i}" in hits for i in range(2000))
    assert all((f"url-{i}" in hits) == sketches.bloom_contains(b, f"url-{i}")
               for i in range(0, 3000, 7))


def test_bloom_merge_equals_union_build(spark):
    """Shard-built filters OR-merge to exactly the union-built filter —
    the mergeable property that lets days/sources build independently."""
    items = [(f"u{i}",) for i in range(1000)]
    whole = sketches.bloom_build(
        spark.createDataFrame(items, "u string"), "u", 1000, 0.02)
    h1 = sketches.bloom_build(
        spark.createDataFrame(items[:500], "u string"), "u", 1000, 0.02)
    h2 = sketches.bloom_build(
        spark.createDataFrame(items[500:], "u string"), "u", 1000, 0.02)
    assert sketches.bloom_merge(h1, h2) == whole
    with pytest.raises(ValueError):
        other = sketches.bloom_build(
            spark.createDataFrame(items, "u string"), "u", 99, 0.5)
        sketches.bloom_merge(h1, other)


def test_bloom_gate_contract_real_tables(spark):
    """The driver-gate shape on real testdata: filter over orders'
    custkeys, probe customers — every ordering customer hits, orderless
    false positives bounded."""
    from fermor_spark.queries import QUERIES

    row = QUERIES["sketch_bloom_membership"](spark, SF).collect()[0]
    assert row["n_probed"] > 0
    assert 0 < row["n_members"] < row["n_probed"]   # non-members planted
    assert row["no_false_negatives"] is True
    assert row["fp_within_bound"] is True
