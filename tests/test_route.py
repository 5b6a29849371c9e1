"""Route algebra tests — traversal steps, lookahead, recommender.

Expected values from the reference's committed test assertions
(test/fermor/gremlin_examples_test.clj).
"""

from pyspark.sql import functions as F

from tests.fixtures import job_graph, rec_graph, edges_graph


def test_out_in_both(spark):
    g = job_graph(spark)
    assert g.get_vertex("bob").out("completes").id_set() == {"appBob1", "appBob2"}
    assert g.get_vertex("blueprintsJob1").in_("created").id_set() == {"blueprints"}
    assert g.get_vertex("appBob1").both().id_set() == {"bob", "blueprintsJob1"}


def test_edge_steps(spark):
    g = job_graph(spark)
    e = g.get_vertex("bob").out_e("completes")
    assert set(e.edge_tuples()) == {("completes", "bob", "appBob1"), ("completes", "bob", "appBob2")}
    assert e.in_v().id_set() == {"appBob1", "appBob2"}
    assert e.out_v().id_set() == {"bob"}
    assert e.other_v().id_set() == {"appBob1", "appBob2"}
    assert e.same_v().id_set() == {"bob"}
    r = g.get_vertex("appBob1").in_e("completes")
    assert r.other_v().id_set() == {"bob"}
    assert r.followed_reverse().count() == 1
    assert r.followed_forward().count() == 0


def test_job_graph_traversal(spark):
    """The flagship query (reference: gremlin_examples_test.clj:58-83).

    For stephen: {(blueprintsJob3, blueprints, appStephen2),
                  (rexsterJob1, rexster, appStephen1)}.
    """
    g = job_graph(spark)
    person = g.get_vertex("stephen")
    apps = person.out("completes")
    tagged = apps._with(apps.df.withColumn("_app", F.col("id")))
    jobs = tagged.out("appliesTo")
    created = jobs.in_e("created")
    rows = {
        (r["dst"], r["src"], r["_app"])
        for r in created.df.select("dst", "src", "_app").collect()
    }
    assert rows == {
        ("blueprintsJob3", "blueprints", "appStephen2"),
        ("rexsterJob1", "rexster", "appStephen1"),
    }


def test_lookahead(spark):
    g = job_graph(spark)
    # jobs with an application completed by stephen
    jobs = (
        g.vertices_with_edge("created")
        and g.vertices()
        .lookahead(lambda r: r.in_("appliesTo").in_("completes").is_("stephen"))
    )
    assert jobs.id_set() == {"blueprintsJob3", "rexsterJob1"}


def test_lookahead_counts(spark):
    g = job_graph(spark)
    # companies that created at least 2 jobs
    r = g.vertices().lookahead(lambda x: x.out("created"), min_count=2)
    assert r.id_set() == {"blueprints"}
    r = g.vertices().lookahead(lambda x: x.out("created"), min_count=1, max_count=1)
    assert r.id_set() == {"rexster"}


def test_neg_lookahead(spark):
    g = job_graph(spark)
    companies = g.vertices().has_property("type", "company")
    r = companies.neg_lookahead(lambda x: x.out("created").in_("appliesTo").in_("completes").is_("bob"))
    assert r.id_set() == {"rexster"}


def test_has_property_and_values(spark):
    g = job_graph(spark)
    people = g.vertices().has_property("type", "person")
    assert people.id_set() == {"bob", "stephen"}
    names = {r["name"] for r in people.values("name").collect()}
    assert names == {"Bob", "Stephen"}


def test_of_kind(spark):
    g = rec_graph(spark)
    assert g.vertices("person").count() == 5
    assert g.vertices().of_kind("product").count() == 10


def test_siblings(spark):
    g = edges_graph(spark, "in", [("a", "p"), ("b", "p"), ("c", "p"), ("d", "q")])
    sibs = g.get_vertex("a").siblings("in")
    assert sibs.id_set() == {"b", "c"}


def test_recommender(spark):
    """Collaborative-filtering recommender (reference:
    gremlin_examples_test.clj:221-266). Expected per-person {count → products}."""
    g = rec_graph(spark)
    expected = {
        "person:jon": {2: {"product:3", "product:1", "product:5"}, 3: {"product:2", "product:4"}},
        "person:alice": {4: {"product:8", "product:10"}, 5: {"product:9", "product:2"}, 6: {"product:1"}},
        "person:bob": {2: {"product:6", "product:8", "product:10"}, 3: {"product:7", "product:9"}},
        "person:jill": {2: {"product:3", "product:1", "product:5"}, 3: {"product:7", "product:9"}},
        "person:jack": {2: {"product:6", "product:8", "product:10"}, 3: {"product:2", "product:4"}},
    }
    for person, exp in expected.items():
        own = g.get_vertex(person).out("bought")
        recs = (
            own.in_("bought")
            .isnt("person:alice")  # the reference query hard-codes excluding alice
            .out("bought")
            .minus(own)
        )
        got = {}
        for r in recs.sorted_group_by_count().collect():
            got[r["count"]] = set(r["items"])
        assert got == exp, person


def test_branch_merge(spark):
    g = job_graph(spark)
    bob = g.get_vertex("bob")
    from fermor_spark.route import Route

    branches = bob.branch(lambda r: r.out("completes"), lambda r: r.out("completes"))
    m = Route.merge_exhaustive(branches)
    assert m.count() == 4
    assert {r["_branch"] for r in m.df.select("_branch").collect()} == {0, 1}


def test_set_ops(spark):
    g = job_graph(spark)
    a = g.get_vertices(["bob", "stephen", "rexster"])
    b = g.get_vertices(["stephen", "rexster", "blueprints"])
    assert a.intersect(b).id_set() == {"stephen", "rexster"}
    assert a.minus(b).id_set() == {"bob"}
    assert a.union(b).count() == 6


def test_group_count(spark):
    g = job_graph(spark)
    gc = {r["key"]: r["count"] for r in g.vertices().out_e().df.groupBy(
        F.col("label").alias("key")).count().collect()}
    assert gc == {"completes": 4, "appliesTo": 4, "created": 4}


def test_paths(spark):
    g = job_graph(spark)
    r = g.get_vertex("bob").with_path().out_e("completes").in_v().out("appliesTo")
    paths = {tuple(row["path"]) for row in r.paths().collect()}
    assert ("v:bob", "e:completes:bob:appBob1", "v:appBob1",
            "e:appliesTo:appBob1:blueprintsJob1", "v:blueprintsJob1") in paths
    assert len(paths) == 2
    # path_vertices strips edges
    pv = {tuple(row["path"]) for row in r.path_vertices().collect()}
    assert ("v:bob", "v:appBob1", "v:blueprintsJob1") in pv


def test_distinct_and_limit(spark):
    g = job_graph(spark)
    r = g.vertices().out_e().in_v()  # 12 edge targets; jobs appear twice
    assert r.count() == 12
    assert r.distinct().count() == 8
    assert g.vertices().limit(3).count() == 3


def test_lookahead_max_only_keeps_zero(spark):
    # max-only lookahead: elements with an EMPTY sub-route count as 0 and are
    # kept (reference keeps count-0 elements when min is nil, core.clj:826-846)
    g = job_graph(spark)
    r = g.vertices().lookahead(lambda x: x.out("created"), max_count=1)
    ids = r.id_set()
    # every vertex with 0 or 1 created-edges: i.e. everything except blueprints
    assert "rexster" in ids and "blueprints" not in ids
    assert "bob" in ids  # has no created edges at all → count 0 → kept


def test_broadcast_frontier_identical_results(spark):
    """broadcast_frontier is a pure plan hint: results must be identical
    to the un-hinted traversal through chained hops, filters, and carried
    columns (the r15 recommender pin relies on this)."""
    g = job_graph(spark)
    base = g.vertices().where(F.col("id").isin("alice", "bob"))
    plain = (base._with(base.df.withColumn("_o", F.col("id")))
             .out("completes").out("appliesTo"))
    hinted_base = base.broadcast_frontier()
    hinted = (hinted_base._with(
        hinted_base.df.withColumn("_o", F.col("id")))
        .out("completes").out("appliesTo"))
    a = sorted((r["_o"], r["id"]) for r in plain.df.collect())
    b = sorted((r["_o"], r["id"]) for r in hinted.df.collect())
    assert a == b and a, a
    # the flag survives _with and chained hops
    assert getattr(hinted, "_broadcast_frontier", False)
