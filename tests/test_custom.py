"""Domain-DSL wrapper tests (the custom-graph extension surface) and
streaming join tests."""

from pyspark.sql import functions as F

from fermor_spark import streaming
from fermor_spark.custom import HiringGraph
from fermor_spark.datasets import table
from tests.fixtures import job_graph

SF = "/root/testdata/sf0.001"


def test_hiring_dsl(spark):
    g = HiringGraph.wrap(job_graph(spark))
    # domain steps chain with core steps and stay in the DSL
    r = g.people().applications().jobs()
    assert type(r).__name__ == "HiringRoute"
    assert r.id_set() == {"blueprintsJob1", "blueprintsJob2", "rexsterJob1", "blueprintsJob3"}
    assert g.companies().id_set() == {"blueprints", "rexster"}
    # jobs created by blueprints that stephen applied to
    jobs = (
        g.companies().is_("blueprints").out("created")
        .lookahead(lambda x: x.in_("appliesTo").in_("completes").is_("stephen"))
    )
    assert jobs.id_set() == {"blueprintsJob3"}
    # company of stephen's applications' jobs
    assert g.people().is_("stephen").applications().jobs().company().id_set() == {
        "blueprints", "rexster"}
    # the one-hop auto hint rides DSL chains with core semantics (r17):
    # set by is_, survives a filter, consumed by the first hop
    pointed = g.people().is_("stephen").where("id IS NOT NULL")
    assert getattr(pointed, "_bcast_auto", False)
    hopped = pointed.applications()
    assert type(hopped).__name__ == "HiringRoute"
    assert not getattr(hopped, "_bcast_auto", True)


def test_stream_static_enrich(spark):
    s = streaming.read_events_stream(spark, SF)
    dim = spark.createDataFrame(
        [(t,) for t in ["click", "view", "purchase", "signup", "error"]], "event_type string"
    ).withColumn("is_purchase", F.col("event_type") == "purchase")
    out = streaming.enrich_with_dimension(s, dim, "event_type")
    streaming.run_to_memory(out, "t_enrich")
    df = spark.table("t_enrich")
    assert df.where(F.col("is_purchase")).count() == \
        table(spark, SF, "events").where(F.col("event_type") == "purchase").count()


def test_stream_self_join(spark):
    s = streaming.read_events_stream(spark, SF)
    out = streaming.self_join_within(s, minutes=10)
    streaming.run_to_memory(out, "t_selfjoin")
    got = spark.table("t_selfjoin")
    # batch equivalent
    e = table(spark, SF, "events")
    a, b = e.alias("a"), e.alias("b")
    exp = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
    ).count()
    assert got.count() == exp
    assert got.where(F.col("gap_seconds") > 600).count() == 0
