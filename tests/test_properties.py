"""Property-based tests (hypothesis) over random small graphs — beyond the
reference's example-only test strategy (SURVEY §5 notes it has no
property-based coverage)."""

import pytest
from hypothesis import given, settings, strategies as st

from fermor_spark import PropertyGraph, algo, iterate

pytestmark = pytest.mark.filterwarnings("ignore")


def _graph(spark, edges):
    return PropertyGraph.build(spark).add_edges("l", edges or [("z0", "z1")]).forked()


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7).map(lambda i: f"v{i}"),
        st.integers(min_value=0, max_value=7).map(lambda i: f"v{i}"),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=14, unique=True,
)


@settings(max_examples=6, deadline=None)
@given(edges=edge_lists)
def test_out_of_transpose_equals_in(spark, edges):
    g = _graph(spark, edges)
    t = g.transpose()
    for v in list(g.vertices().id_set())[:3]:
        assert g.get_vertex(v).in_("l").id_set() == t.get_vertex(v).out("l").id_set()


@settings(max_examples=4, deadline=None)
@given(edges=edge_lists)
def test_cc_matches_union_find(spark, edges):
    g = _graph(spark, edges)
    comp_rows = iterate.connected_components(g).collect()
    got = {}
    for r in comp_rows:
        got.setdefault(r["comp"], set()).add(r["id"])

    # reference model: pure-python union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    exp = {}
    for v in set(x for e in edges for x in e):
        exp.setdefault(find(v), set()).add(v)
    assert set(map(frozenset, got.values())) == set(map(frozenset, exp.values()))


@settings(max_examples=3, deadline=None)
@given(edges=edge_lists)
def test_distributed_scc_matches_tarjan(spark, edges):
    # local_edge_threshold=0 forces the pure FW-BW flood path — the hybrid
    # local finish would otherwise route these small graphs to the same
    # Tarjan we compare against
    g = _graph(spark, edges)
    dist_rows = iterate.strongly_connected_components(
        g, local_edge_threshold=0
    ).collect()
    got = {}
    for r in dist_rows:
        got.setdefault(r["component"], set()).add(r["id"])
    succ, _ = algo.collect_adjacency(g)
    exp = algo.strongly_connected_components(succ, include_singletons=True)
    assert set(map(frozenset, got.values())) == exp


@settings(max_examples=6, deadline=None)
@given(edges=edge_lists)
def test_lookahead_equiv_nonempty_out(spark, edges):
    g = _graph(spark, edges)
    via_lookahead = g.vertices().lookahead(lambda r: r.out("l")).id_set()
    have_out = {e[0] for e in edges} or {"z0"}
    assert via_lookahead == have_out


@settings(max_examples=3, deadline=None)
@given(edges=edge_lists)
def test_reachable_closed_under_step(spark, edges):
    """all_reachable's result is transitively closed: stepping out of the
    reachable set stays inside it."""
    g = _graph(spark, edges)
    start = sorted(g.vertices().id_set())[0]
    reach = {r["id"] for r in
             iterate.all_reachable(g, g.get_vertex(start), include_start=True).collect()}
    step = g.get_vertices(sorted(reach)).out("l").id_set()
    assert step <= reach


# ---- progressive JPEG: pure-Python property (no Spark session needed) ----

@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seedv=st.integers(min_value=0, max_value=2**31 - 1),
    q=st.sampled_from([4, 8, 16]),
    al=st.integers(min_value=0, max_value=2),
    dri=st.sampled_from([0, 1, 3]),
)
def test_progressive_jpeg_equals_baseline_decode(w, h, seedv, q, al, dri):
    """For ANY image content, size, quant step, successive-approximation
    depth and restart interval, decoding the progressive encoding must be
    byte-identical to decoding the baseline encoding: both encoders emit
    the same quantized coefficients, so the decodes can only diverge if a
    progressive scan path (spectral bands, refinement correction bits,
    EOB runs, restarts) mis-decodes."""
    import numpy as np

    from fermor_spark.pipeline.multimodal import (
        _jpeg_decode, _jpeg_encode, _jpeg_prog_encode)

    arr = np.random.RandomState(seedv).randint(
        0, 256, size=(h, w), dtype=np.uint8)
    base = _jpeg_decode(_jpeg_encode(arr, q=q))
    prog = _jpeg_decode(_jpeg_prog_encode(arr, q=q, al=al, dri=dri))
    assert base not in (None, "compressed")
    assert prog not in (None, "compressed")
    assert prog[:3] == base[:3] == (w, h, 1)
    assert prog[3] == base[3]
