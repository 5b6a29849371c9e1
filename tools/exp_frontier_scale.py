"""broadcast_frontier scale probe: does the hinted hop stay flat as the
edge table grows? (r15; companion evidence to Route.broadcast_frontier
and the g_recommender pin.)

At each m-fold structure-preserving replication of the graph tables
(tools/scale_probe.replicate — more customers/orders/parts, same shape),
time the recommender's traversal core (20-origin 3-hop co-purchase walk +
ownership anti-join) with (A) the frontier broadcast-pinned and (B) the
un-hinted default (SortMergeJoin planned, AQE repairs after the edge
shuffle map stages ran). The claim under test: A's added cost per hop is
one in-place edge SCAN (grows linearly, no data motion), while B pays a
full edge SHUFFLE WRITE per hop — so the A/B gap should WIDEN with m.

Arms are interleaved within each scale (same session, fresh graph cache
per timed run is NOT needed — both arms read the same cached edge table,
which is the bench condition too). Best of 3 timed runs after 1 warm-up.

Run: python tools/exp_frontier_scale.py [m ...]   (default 1 4 16)
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from fermor_spark.session import get_spark, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def traversal(g, hint: bool):
    """The recommender core as route ops: 20-origin 3-hop + anti-join."""
    cust = g.vertices("customer").where(
        F.split(F.col("id"), ":").getItem(1).cast("long") <= 20)
    if hint:
        cust = cust.broadcast_frontier()
    tagged = cust._with(cust.df.withColumn("_self", F.col("id")))
    hop3 = (tagged.out("bought").in_("bought")
            .where(F.col("id") != F.col("_self")).out("bought"))
    own = g._edges_df("bought").select(
        F.col("src").alias("_self"), F.col("dst").alias("id"))
    scored = (hop3.df.join(own, ["_self", "id"], "left_anti")
              .groupBy("_self", "id").agg(F.count("*").alias("score")))
    w = Window.partitionBy("_self").orderBy(F.col("score").desc(), F.col("id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 5))


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="frontier-scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fermor_spark.datasets import _graph_cache, star_graph
    from tools.scale_probe import replicate

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def drain():
        release_caches()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)

    out = {"sf_dir": SF_DIR, "scales": {}}
    for m in scales:
        if m == 1:
            d = SF_DIR
        else:
            d = f"/tmp/frontier_scale_x{m}"
            replicate(spark, SF_DIR, d, m)
        _graph_cache.clear()
        g = star_graph(spark, d)
        n_edges = g.E.count()
        g.V.count()
        res = {"edges": n_edges, "A_hint": [], "B_nohint": []}
        force(traversal(g, True))   # shared warm-up (codegen)
        for _ in range(3):
            t0 = time.perf_counter()
            force(traversal(g, True))
            res["A_hint"].append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            force(traversal(g, False))
            res["B_nohint"].append(round(time.perf_counter() - t0, 3))
        res["A_best"] = min(res["A_hint"])
        res["B_best"] = min(res["B_nohint"])
        res["ratio_B_over_A"] = round(res["B_best"] / res["A_best"], 3)
        out["scales"][f"x{m}"] = res
        print(f"x{m}: edges={n_edges} A(hint)={res['A_hint']} "
              f"B(nohint)={res['B_nohint']} ratio={res['ratio_B_over_A']}",
              flush=True)
        drain()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
