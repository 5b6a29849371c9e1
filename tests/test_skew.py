"""Skew-salting utilities: results must equal the unsalted equivalents."""

from pyspark.sql import functions as F

from fermor_spark import skew
from fermor_spark.datasets import table

SF = "/root/testdata/sf0.001"


def test_salted_group_count_matches(spark):
    li = table(spark, SF, "lineitem")
    got = {r["l_returnflag"]: r["count"] for r in
           skew.salted_group_count(li, ["l_returnflag"]).collect()}
    exp = {r["l_returnflag"]: r["n"] for r in
           li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    assert got == exp


def test_salted_agg_matches(spark):
    li = table(spark, SF, "lineitem")
    got = {r["l_returnflag"]: (r["sum_l_quantity"], r["max_l_extendedprice"]) for r in
           skew.salted_agg(li, ["l_returnflag"],
                           {"l_quantity": "sum", "l_extendedprice": "max"}).collect()}
    exp = {r["l_returnflag"]: (r["s"], r["m"]) for r in
           li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"),
                                          F.max("l_extendedprice").alias("m")).collect()}
    for k in exp:
        assert abs(got[k][0] - exp[k][0]) < 1e-6
        assert got[k][1] == exp[k][1]


def test_salted_join_matches(spark):
    li = table(spark, SF, "lineitem").select(F.col("l_partkey").alias("k"), "l_quantity")
    part = table(spark, SF, "part").select(F.col("p_partkey").alias("k"), "p_brand")
    got = skew.salted_join(li, part, "k").count()
    exp = li.join(part, "k").count()
    assert got == exp


def test_salted_join_rejects_other_preserving(spark):
    import pytest

    li = table(spark, SF, "lineitem").select(F.col("l_partkey").alias("k"))
    part = table(spark, SF, "part").select(F.col("p_partkey").alias("k"))
    with pytest.raises(ValueError, match="salted_join supports"):
        skew.salted_join(li, part, "k", how="full")
