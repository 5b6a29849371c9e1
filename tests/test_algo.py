"""Driver-side algorithm tests — expected values are the reference's
committed assertions in test/fermor/graph/algo_test.clj, themselves derived
from published compiler-construction literature (Offner GRAPHS notes,
Cooper-Harvey-Kennedy DOM paper, Eli Bendersky's traversal-orderings post)."""

import pytest

from fermor_spark import algo
from tests.fixtures import edges_graph


@pytest.fixture(scope="module")
def graphs(spark):
    gs = {}
    gs["simple"] = edges_graph(spark, "to", [
        ("A", "T"), ("A", "B"), ("A", "C"), ("T", "B"), ("C", "B"),
        ("B", "D"), ("C", "E"), ("E", "D")])
    gs["cyclic"] = edges_graph(spark, "to", [
        ("X", "T"), ("X", "B"), ("X", "C"), ("T", "B"), ("B", "D"), ("C", "E"),
        ("E", "D"), ("E", "M"), ("M", "C"), ("D", "G"), ("G", "D")])
    gs["p46"] = edges_graph(spark, "to", [
        ("entry", "head"), ("head", "body"), ("body", "head"), ("head", "result")])
    gs["double"] = edges_graph(spark, "to", [
        ("entry", "head"), ("head", "body-entry"), ("body-result", "body"),
        ("body", "head"), ("head", "result"), ("body-entry", "body-head"),
        ("body-head", "body-body"), ("body-body", "body-head"),
        ("body-head", "body-result")])
    gs["flow"] = edges_graph(spark, "to", [
        ("S", "C"), ("S", "B"), ("S", "A"), ("C", "F"), ("C", "G"), ("F", "I"),
        ("G", "I"), ("G", "J"), ("I", "K"), ("K", "I"), ("K", "S"), ("B", "E"),
        ("B", "A"), ("E", "H"), ("H", "E"), ("H", "K"), ("A", "D")])
    gs["irreducible"] = edges_graph(spark, "to", [
        ("5", "4"), ("5", "3"), ("4", "1"), ("1", "2"), ("3", "2"), ("2", "1")])
    gs["flow2"] = edges_graph(spark, "to", [
        ("S", "A"), ("S", "B"), ("A", "B"), ("B", "C"), ("C", "D"), ("C", "E"),
        ("D", "F"), ("E", "F"), ("E", "J"), ("E", "C"), ("F", "C"), ("F", "G"),
        ("F", "L"), ("I", "F"), ("G", "I"), ("G", "B"), ("J", "K"), ("K", "J"),
        ("L", "J"), ("L", "N"), ("L", "M"), ("M", "N"), ("M", "L"), ("N", "L"),
        ("M", "O"), ("G", "O"), ("H", "O"), ("H", "S"), ("G", "H"), ("O", "P"),
        ("P", "O"), ("P", "Q"), ("Q", "P")])
    gs["loops"] = edges_graph(spark, "to", [
        ("1", "2"), ("1", "3"), ("2", "3"), ("3", "4"), ("4", "5"), ("4", "6"),
        ("5", "7"), ("6", "7"), ("4", "3"), ("7", "4"), ("7", "8"), ("8", "3"),
        ("8", "9"), ("9", "1"), ("8", "10"), ("10", "7")])
    return {k: algo.cfg(v) for k, v in gs.items()} | {"_g": gs}


def test_postwalk(graphs):
    # algo_test.clj:19-21 / 23-25
    assert graphs["simple"].postwalk("A") == ["D", "B", "E", "C", "T", "A"]
    assert graphs["simple"].reverse_postwalk("A") == ["A", "T", "C", "E", "B", "D"]


def test_postwalk_cyclic(graphs):
    # algo_test.clj:94-110
    assert graphs["cyclic"].postwalk("X") == ["G", "D", "B", "M", "E", "C", "T", "X"]
    assert graphs["cyclic"].reverse_postwalk("X") == ["X", "T", "C", "E", "M", "B", "D", "G"]


def test_dominators_cyclic(graphs):
    # algo_test.clj:113-123
    assert graphs["cyclic"].immediate_dominators("X") == {
        "X": "X", "T": "X", "C": "X", "E": "C", "M": "E", "B": "X", "D": "X", "G": "D",
    }


def test_scc_cyclic(graphs):
    # algo_test.clj:126-139
    assert graphs["cyclic"].scc() == {frozenset({"M", "C", "E"}), frozenset({"D", "G"})}
    assert graphs["cyclic"].scc(include_singletons=True) == {
        frozenset({"M", "C", "E"}), frozenset({"D", "G"}),
        frozenset({"X"}), frozenset({"B"}), frozenset({"T"}),
    }


def test_scc_subgraphs(graphs, spark):
    # algo_test.clj:142-153
    g = algo.strongly_connected_subgraphs(graphs["_g"]["cyclic"], "to")
    assert {r["id"] for r in g.vertices_with_edge("0").collect()} == {"M", "C", "E"}
    assert {r["id"] for r in g.vertices_with_edge("1").collect()} == {"D", "G"}
    assert g._edges_df("to").count() == 11
    assert g._edges_df(["0", "1", "2"]).count() == 5


def test_dominance_frontiers_cyclic(graphs):
    # algo_test.clj:155-165
    assert graphs["cyclic"].dominance_frontiers("X") == {
        "X": set(), "T": {"B"}, "C": {"D", "C"}, "E": {"D", "C"},
        "M": {"C"}, "B": {"D"}, "D": {"D"}, "G": {"D"},
    }


def test_loop_tree_simple(graphs):
    # algo_test.clj:58-71
    assert graphs["simple"].loop_tree("A") == {}
    assert graphs["p46"].loop_tree("entry") == {
        ("head", "body"): {"loop_num": 0, "parent": None, "depth": 0},
    }
    assert graphs["double"].loop_tree("entry") == {
        ("head", "body"): {"loop_num": 0, "parent": None, "depth": 0},
        ("body-head", "body-body"): {"loop_num": 1, "parent": ("head", "body"), "depth": 1},
    }
    assert graphs["cyclic"].loop_tree("X") == {
        ("D", "G"): {"loop_num": 1, "parent": None, "depth": 0},
        ("C", "M"): {"loop_num": 0, "parent": None, "depth": 0},
    }


def test_loop_info_double(graphs):
    # algo_test.clj:73-92
    info = graphs["double"].loop_info("entry")
    outer = {"loop_num": 0, "parent": None, "depth": 1, "from": "head", "to": "body"}
    inner = {"loop_num": 1, "parent": ("head", "body"), "depth": 2,
             "from": "body-head", "to": "body-body"}
    assert info["entry"] == {"depth": 0}
    assert info["result"] == {"depth": 0}
    for v in ["body", "body-entry", "head", "body-result"]:
        assert info[v] == outer, v
    for v in ["body-head", "body-body"]:
        assert info[v] == inner, v


def test_flow_graph(graphs):
    # algo_test.clj:177-240
    c = graphs["flow"]
    assert c.reverse_postwalk("S") == ["S", "C", "G", "J", "F", "B", "E", "H", "K", "I", "A", "D"]
    assert c.immediate_dominators("S") == {
        "H": "E", "S": "S", "K": "S", "I": "S", "A": "S", "F": "C",
        "D": "A", "B": "S", "J": "G", "C": "S", "E": "B", "G": "C",
    }
    assert c.dominance_frontiers("S") == {
        "A": set(), "B": {"K", "A"}, "C": {"I"}, "D": set(), "E": {"K", "E"},
        "F": {"I"}, "G": {"I"}, "H": {"K", "E"}, "I": {"K"}, "J": set(),
        "K": {"I"}, "S": set(),
    }
    # cycles compared as vertex-sets (reference order is engine-incidental)
    assert {frozenset(cy) for cy in c.cycles()} == {
        frozenset({"I", "K"}), frozenset({"I", "K", "S", "C", "F"}),
        frozenset({"I", "K", "S", "C", "G"}), frozenset({"B", "E", "H", "K", "S"}),
        frozenset({"H", "E"}),
    }
    # interval PARTITION matches the reference; list order is engine-
    # incidental (Clojure hash-set iteration) so compare as a set
    assert {frozenset(s) for s in c.intervals("S")} == {
        frozenset({"S", "A", "F", "D", "B", "J", "C", "G"}),
        frozenset({"I"}), frozenset({"K"}), frozenset({"H", "E"}),
    }
    assert c.loop_tree("S") == {
        ("S", "K"): {"loop_num": 0, "parent": None, "depth": 0},
        ("E", "H"): {"loop_num": 1, "parent": ("S", "K"), "depth": 1},
        ("K", "I"): {"loop_num": 2, "parent": None, "depth": 0},
    }


def test_irreducible(graphs):
    # algo_test.clj:253-265
    c = graphs["irreducible"]
    assert c.immediate_dominators("5") == {"5": "5", "4": "5", "3": "5", "2": "5", "1": "5"}
    assert [frozenset(cy) for cy in c.cycles()] == [frozenset({"1", "2"})]
    assert c.loop_tree("5") == {("2", "1"): {"loop_num": 0, "parent": None, "depth": 0}}


def test_flow2(graphs):
    # algo_test.clj:277-321
    c = graphs["flow2"]
    assert c.immediate_dominators("S") == {
        "A": "S", "B": "S", "C": "B", "D": "C", "E": "C", "F": "C", "G": "F",
        "H": "G", "I": "G", "J": "C", "K": "J", "L": "F", "M": "L", "N": "L",
        "O": "F", "P": "O", "Q": "P", "S": "S",
    }
    assert {frozenset(s) for s in c.intervals("S")} == {
        frozenset({"S", "A"}), frozenset({"B"}), frozenset({"D", "C", "E"}),
        frozenset({"H", "I", "F", "G"}), frozenset({"N", "L", "M"}),
        frozenset({"O"}), frozenset({"Q", "P"}), frozenset({"K", "J"}),
    }
    assert set(c.loop_tree("S").keys()) == {
        ("S", "H"), ("B", "G"), ("C", "F"), ("C", "E"), ("F", "I"),
        ("L", "N"), ("L", "M"), ("J", "K"), ("O", "P"), ("P", "Q"),
    }


def test_loops_graph(graphs):
    # algo_test.clj:347-381
    c = graphs["loops"]
    assert c.immediate_dominators("1") == {
        "7": "4", "1": "1", "4": "3", "6": "4", "3": "1", "2": "1",
        "9": "8", "5": "4", "10": "8", "8": "7",
    }
    assert sorted(c.reverse_post_order_numbering("1").values()) == list(range(10))
    assert c.loop_tree("1") == {
        ("1", "9"): {"loop_num": 0, "parent": None, "depth": 0},
        ("3", "8"): {"loop_num": 1, "parent": ("1", "9"), "depth": 1},
        ("3", "4"): {"loop_num": 2, "parent": ("3", "8"), "depth": 2},
        ("4", "7"): {"loop_num": 3, "parent": ("3", "8"), "depth": 2},
        ("7", "10"): {"loop_num": 4, "parent": ("3", "8"), "depth": 2},
    }


def test_dominator_depth(graphs):
    c = graphs["cyclic"]
    doms = c.immediate_dominators("X")
    depth = algo.dominator_depth(doms, "X")
    assert depth == {"X": 0, "T": 1, "C": 1, "E": 2, "M": 3, "B": 1, "D": 1, "G": 2}


def test_articulation_and_bcc(spark):
    # two triangles sharing vertex c: c is the cut vertex, two BCCs
    g = edges_graph(spark, "u", [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("e", "c")])
    assert algo.articulation_points(g, "u") == {"c"}
    bccs = algo.biconnected_components(g, "u")
    assert len(bccs) == 2


def test_size_guard(spark):
    g = edges_graph(spark, "l", [("a", "b"), ("b", "c")])
    with pytest.raises(algo.SizeGuardError):
        algo.collect_adjacency(g, max_edges=1)
