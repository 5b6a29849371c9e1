"""Condition-handler surface (reference: pure-conditioning signals
:vertex-not-found src/fermor/core.clj:254, :on-cycle core.clj:1365,
:missing-documents core.clj:104,128) and the bidirectional NetworkX
adapter (reference Loom adapter, src/fermor/loom_graph.clj:35-168)."""

import pytest

from fermor_spark import PropertyGraph, conditions
from fermor_spark.conditions import Condition, handling, set_handler

from fixtures import edges_graph


def test_vertex_not_found_unhandled_raises(spark):
    g = edges_graph(spark, "l", [("a", "b")])
    with pytest.raises(KeyError):
        g.get_vertex_checked("nope")
    with pytest.raises(Condition) as ei:
        g.get_vertex_checked("nope")
    assert ei.value.name == "vertex-not-found"
    assert ei.value.context["id"] == "nope"


def test_vertex_not_found_handler_returns_default(spark):
    g = edges_graph(spark, "l", [("a", "b")])
    with handling("vertex-not-found", lambda ctx: None):
        assert g.get_vertex_checked("nope") is None
    # binding is lexical: outside the block the signal raises again
    with pytest.raises(Condition):
        g.get_vertex_checked("nope")


def test_on_cycle_handler_break_and_continue(spark):
    g = edges_graph(spark, "l", [("a", "b"), ("b", "a")])
    r = g.get_vertex("a").with_path().out("l").out("l").out("l")
    with pytest.raises(ValueError):
        r.no_cycles()
    # falsy handler result -> break out (prevent_cycles truncation)
    with handling("on-cycle", lambda ctx: False):
        assert r.no_cycles().count() == 0
    # truthy handler result -> continue cycling (route unchanged)
    with handling("on-cycle", lambda ctx: True):
        assert r.no_cycles().count() == r.count()


def test_global_set_handler_and_unbind(spark):
    g = edges_graph(spark, "l", [("a", "b")])
    set_handler("vertex-not-found", lambda ctx: "fallback")
    try:
        assert g.get_vertex_checked("nope") == "fallback"
    finally:
        set_handler("vertex-not-found", None)
    with pytest.raises(Condition):
        g.get_vertex_checked("nope")


def test_missing_documents_signal(spark):
    g = PropertyGraph.build(spark)
    # matched lengths: no signal
    g2 = g.add_edges_from("l", "a", ["b", "c"], edge_documents=[{"w": 1}, {"w": 2}])
    assert g2.forked().get_edge("l", "a", "c") is not None
    # shortfall: unhandled signal raises
    with pytest.raises(Condition) as ei:
        g.add_edges_from("l", "a", ["b", "c"], edge_documents=[{"w": 1}])
    assert ei.value.name == "missing-documents"
    # handler accepts the zipped prefix
    with handling("missing-documents", lambda ctx: ctx["triples"]):
        g3 = g.add_edges_from("l", "a", ["b", "c"], edge_documents=[{"w": 1}])
    assert g3.forked().edges("l").count() == 1


def test_add_edges_to_direction(spark):
    g = PropertyGraph.build(spark).add_edges_to("l", ["x", "y"], "hub").forked()
    assert sorted(r["src"] for r in g.edges("l").df.collect()) == ["x", "y"]
    assert {r["dst"] for r in g.edges("l").df.collect()} == {"hub"}


def test_networkx_round_trip(spark):
    nx = pytest.importorskip("networkx")
    g = (
        PropertyGraph.build(spark)
        .add_edges("road", [("a", "b", {"miles": 3}), ("b", "c")])
        .add_vertices([("a", {"pop": 10}, "city"), ("b", None, "town")])
        .forked()
    )
    G = g.to_networkx()
    g2 = PropertyGraph.from_networkx(spark, G)
    assert g.graph_equals(g2)
    kinds = {r["id"]: r["kind"] for r in g2.V.collect()}
    assert kinds["a"] == "city"


def test_default_graph_literals(spark):
    from fermor_spark.graph import default_graph, e, use_graph, v

    g = edges_graph(spark, "l", [("a", "b")])
    assert default_graph() is None
    assert v("a") == ("a", None)           # detached literal
    assert e("l", "a", "b") == ("l", "a", "b")
    with use_graph(g):
        assert default_graph() is g
        assert v("a").count() == 1          # point-lookup Route in g
        assert e("l", "a", "b").count() == 1
        assert e("l", "b", "a").count() == 0
    assert default_graph() is None


def test_from_networkx_weights_and_labels(spark):
    nx = pytest.importorskip("networkx")
    G = nx.MultiDiGraph()
    G.add_edge("u", "v", label="w8", weight=2.5)
    G.add_edge("v", "u")
    g = PropertyGraph.from_networkx(spark, G).forked()
    e = {(r["label"], r["src"], r["dst"]): r["weight"] for r in g.E.collect()}
    assert e[("w8", "u", "v")] == 2.5
    assert ("edge", "v", "u") in e
