"""Tests for descend, path-carrying shortest paths, save/load, small parity ops."""

import tempfile

from pyspark.sql import functions as F

from fermor_spark import PropertyGraph, iterate
from tests.fixtures import edges_graph, job_graph, rec_graph


def test_descend_generic(spark):
    g = edges_graph(spark, "to", [("a", "b"), ("b", "c"), ("c", "d"), ("b", "x")])
    # emit only vertices > 'b', stop descending below 'c'
    out = iterate.descend(
        g, g.get_vertex("a"),
        children=lambda r: r.out("to"),
        emit_pred=F.col("id") > "b",
        descend_pred=F.col("id") != "c",
    )
    rows = {(r["id"], r["_depth"]) for r in out.collect()}
    assert rows == {("c", 2), ("x", 2)}  # d never reached (cut below c)


def test_descend_all_levels(spark):
    g = edges_graph(spark, "to", [("a", "b"), ("b", "c")])
    out = iterate.descend(g, g.get_vertex("a"), children=lambda r: r.out("to"))
    assert {(r["id"], r["_depth"]) for r in out.collect()} == {
        ("a", 0), ("b", 1), ("c", 2)}


def test_shortest_path_with_routes(spark):
    g = (
        PropertyGraph.build(spark, edge_builders={"w": "weighted"})
        .add_edges("w", [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0), ("c", "d", 1.0)])
        .forked()
    )
    got = {r["id"]: (r["dist"], tuple(r["path"])) for r in
           iterate.shortest_path_with_routes(g, g.get_vertex("a"), labels="w").collect()}
    assert got["d"] == (3.0, ("a", "b", "c", "d"))
    assert got["c"] == (2.0, ("a", "b", "c"))


def test_save_load_roundtrip(spark):
    g = job_graph(spark)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/graph"
        g.save(path)
        g2 = PropertyGraph.load(spark, path)
        assert g.graph_equals(g2)
        assert g2.get_vertex("bob").out("completes").id_set() == {"appBob1", "appBob2"}
        # label partitioning on disk
        import os
        assert any(d.startswith("label=") for d in os.listdir(f"{path}/edges"))


def test_with_values(spark):
    g = job_graph(spark)
    # people whose applications apply to a blueprints job
    people = g.vertices().has_property("type", "person").with_values(
        lambda r: r.out("completes").out("appliesTo"), ["blueprintsJob3"]
    )
    assert people.id_set() == {"stephen"}


def test_lookup_and_index_by(spark):
    g = rec_graph(spark)
    assert g.lookup("person", "alice").out("bought").count() == 5
    idx = g.vertices("person").index_by()
    assert set(idx.keys()) == {f"person:{p}" for p in ["alice", "bob", "jon", "jack", "jill"]}


def test_merge_round_robin(spark):
    from fermor_spark.route import Route

    g = job_graph(spark)
    r = Route.merge_round_robin([g.get_vertex("bob"), g.get_vertex("stephen")])
    assert r.count() == 2


def test_bucketed_save_colocated_join(spark):
    """src-bucketed persisted edges join on src WITHOUT a shuffle exchange —
    the co-located traversal-join story at scale."""
    import tempfile

    g = job_graph(spark)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/bg"
        g.save(path, bucket_by_src=4)
        name = "fermor_edges_" + path.strip("/").replace("/", "_").replace("-", "_").replace(".", "_")
        t = spark.table(name)
        j = t.alias("a").join(t.alias("b"), "src").select("src")
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() > 0
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_betweenness_size_guard(spark):
    import pytest

    from fermor_spark.algo import SizeGuardError
    from tests.fixtures import betweenness_graph

    g = betweenness_graph(spark)
    with pytest.raises(SizeGuardError):
        iterate.betweenness_counts(g, max_vertices=2)


def test_descend_control_signals(spark):
    """The reference's 8 control signals (core_test.clj:18-164) mapped to
    emit_pred/descend_pred combinations. The siblings/chain bits govern
    lazy-seq sequencing and the `cut` family's truncate-remaining-SIBLINGS
    effect — both order-dependent, with no distributed meaning (SURVEY
    §4.3); subtree semantics (what is emitted / what descends) are
    reproduced exactly. Fixture: 0 -> [1,2,3], 2 -> [9], starts {0,-1,-2}.
    """
    g = edges_graph(spark, "c", [("0", "1"), ("0", "2"), ("0", "3"), ("2", "9")])
    start = g.get_vertices(["0", "-1", "-2"])

    def run(emit_pred=None, descend_pred=None):
        out = iterate.descend(
            g, start, lambda r: r.out("c"),
            emit_pred=emit_pred, descend_pred=descend_pred, max_depth=5,
        )
        return {r["id"] for r in out.select("id").collect()}

    # continue (never emit) -> []
    assert run(emit_pred=F.lit(False)) == set()
    # emit unless v == 0, descend everywhere (emit vs continue per element)
    assert run(emit_pred=F.col("id") != "0") == {"1", "2", "3", "9", "-1", "-2"}
    # emit, never descend (the bare `emit` signal)
    assert run(descend_pred=F.lit(False)) == {"0", "-1", "-2"}
    # cut at 2: no emit, no descent below -> 9 unreachable
    assert run(emit_pred=F.col("id") != "2",
               descend_pred=F.col("id") != "2") == {"0", "1", "3", "-1", "-2"}
    # emit-and-cut at 2: emitted but its subtree pruned -> 9 unreachable
    assert run(descend_pred=F.col("id") != "2") == {"0", "1", "2", "3", "-1", "-2"}
    # ignore negatives, cut at 2 (emit-and-continue elsewhere)
    assert run(emit_pred=~F.col("id").startswith("-") & (F.col("id") != "2"),
               descend_pred=F.col("id") != "2") == {"0", "1", "3"}
