"""broadcast_frontier rollout A/Bs (VERDICT r15 #4): each candidate
surface is adopted only on a measured interleaved win >= 1.3x.

Candidates:
- point: get_vertex/get_vertices/lookup frontiers — a 1-row Python
  createDataFrame becomes Scan ExistingRDD with NO size stats (plan
  audit this round: the point hop is a static SortMergeJoin with BOTH
  sides exchanged; AQE repairs only after both shuffle map stages ran).
  The frontier is literally bounded, so the one-hop auto hint (the
  is_/one_of mechanism) is semantically safe. Measured window =
  g_both_neighbors_nation's exact gate body.
- siblings: g_siblings_same_nation's 50-customer frontier chains two
  hops (out in_); unhinted plan = 1 BHJ + 2 SMJ, sticky-hinted = 3 BHJ
  0 SMJ. Measured window = the gate body with/without the explicit
  broadcast_frontier() opt-in.

Interleaved in ONE session (same convention as exp_pagerank_ab), bench
boundary drain between runs, floors at start/end.

Run: python tools/exp_rollout_ab.py [reps]
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fermor_spark.session import get_spark, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="rollout-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fermor_spark.datasets import TABLES, star_graph, table
    for t in TABLES:
        table(spark, SF_DIR, t).count()
    g = star_graph(spark, SF_DIR)
    g.E.count()
    g.V.count()

    def floor_probe() -> float:
        t0 = time.perf_counter()
        for _ in range(24):
            spark.range(1024).repartition(32).count()
        return round(time.perf_counter() - t0, 3)

    def drain() -> None:
        release_caches()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        # re-warm the fixture the gates share (released by the drain)
        g.E.count()
        g.V.count()

    # ---- candidate 1: point hop (g_both_neighbors_nation body) --------
    def point(hinted: bool):
        r = g.get_vertex("n:0")
        if hinted:
            r._bcast_auto = True
        return r.both(["in_nation", "supp_nation", "in_region"]).df

    # ---- candidate 2: siblings (g_siblings_same_nation body) ----------
    def siblings(hinted: bool):
        cust = g.vertices("customer").where(
            F.split(F.col("id"), ":").getItem(1).cast("long") <= 50)
        if hinted:
            cust = cust.broadcast_frontier()
        sibs = cust._with(cust.df.withColumn("_self", F.col("id"))) \
            .out("in_nation").in_("in_nation")
        return (sibs.df.where(F.col("id") != F.col("_self"))
                .groupBy(F.col("_self").alias("c_id"))
                .agg(F.count("*").alias("n_siblings")))

    results = {}
    floor_start = floor_probe()
    for name, fn in (("point", point), ("siblings", siblings)):
        _force(fn(False))  # shared warm-up
        drain()
        a, b = [], []  # a = hinted, b = unhinted
        for r in range(reps):
            t0 = time.perf_counter()
            _force(fn(True))
            a.append(round(time.perf_counter() - t0, 3))
            drain()
            t0 = time.perf_counter()
            _force(fn(False))
            b.append(round(time.perf_counter() - t0, 3))
            drain()
            print(f"{name} rep {r}: hinted={a[-1]} unhinted={b[-1]}",
                  flush=True)
        med = lambda s: sorted(s)[len(s) // 2]
        results[name] = {
            "hinted": a, "unhinted": b,
            "hinted_best": min(a), "unhinted_best": min(b),
            "win_best": round(min(b) / min(a), 3),
            "win_median": round(med(b) / med(a), 3),
        }
    floor_end = floor_probe()
    print(json.dumps({"sf_dir": SF_DIR, "floor_start": floor_start,
                      "floor_end": floor_end, **results}))


if __name__ == "__main__":
    main()
