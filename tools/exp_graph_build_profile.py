"""graph_build stage profile (VERDICT r17 #1).

The bench's graph_build line (star_graph + E.count + V.count) rose
4.12 -> 4.62 -> 6.34 s across three driver records on a "first-build
parquet scan + forked checkpoint, disk-class" adjudication that was
never confirmed with a stage split. This probe decomposes the exact
timed window into its sequential stages, twice (rep 1 = cold page
cache attribution for the column bytes, rep 2 = warm), in one fresh
session that first replicates bench.py's untimed warm-up (range job +
per-table count()):

  scan        full column read of the 7 source tables (noop sink)
  edges_cpu   edges union computed to the noop sink (no checkpoint)
  verts_cpu   vertices union to the noop sink
  checkpoint  the two concurrent localCheckpoint(eager=True) jobs
              (the fixture cache is cleared so each rep rebuilds)
  counts      g.E.count() + g.V.count() over the checkpointed blocks

plus the checkpointed RDD partition counts and whether the `bought`
join broadcast. Run: python tools/exp_graph_build_profile.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fermor_spark import datasets
from fermor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="graph-build-profile")
    sc = spark.sparkContext
    # bench.py's untimed warm-up, replicated exactly
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in datasets.TABLES:
        datasets.table(spark, SF_DIR, t).count()

    out = []
    for rep in range(reps):
        # clear the graph fixture cache so star_graph rebuilds; keep the
        # table cache (bench.py keeps it too)
        datasets._graph_cache.clear()
        r: dict = {"rep": rep}

        t0 = time.perf_counter()
        sc.setJobDescription("profile: full column scan")
        for t in datasets.TABLES[:7]:
            _force(datasets.table(spark, SF_DIR, t))
        r["scan"] = round(time.perf_counter() - t0, 3)

        # rebuild the edge/vertex frames exactly as star_graph does, by
        # calling into its body up to the checkpoint: reproduce via the
        # module's own code path but intercept localCheckpoint
        # Spark 4: pyspark.sql.DataFrame is an ABC; patch the CONCRETE
        # class (classic.dataframe.DataFrame) or instances never see it
        from pyspark.sql.classic.dataframe import DataFrame
        orig_cp = DataFrame.localCheckpoint
        captured = {}

        def fake_cp(self, eager=True):
            captured[len(captured)] = self
            return self  # no materialization

        DataFrame.localCheckpoint = fake_cp
        try:
            datasets._graph_cache.clear()
            datasets.star_graph(spark, SF_DIR)
        finally:
            DataFrame.localCheckpoint = orig_cp
        edges_df, verts_df = captured[0], captured[1]
        # identify which is which by schema
        if "label" not in edges_df.columns:
            edges_df, verts_df = verts_df, edges_df

        sc.setJobDescription("profile: edges compute (noop)")
        t0 = time.perf_counter()
        _force(edges_df)
        r["edges_cpu"] = round(time.perf_counter() - t0, 3)

        sc.setJobDescription("profile: vertices compute (noop)")
        t0 = time.perf_counter()
        _force(verts_df)
        r["verts_cpu"] = round(time.perf_counter() - t0, 3)

        sc.setJobDescription("profile: concurrent localCheckpoint")
        import threading
        done: dict = {}

        def _cp(key, df):
            done[key] = df.localCheckpoint(eager=True)

        t0 = time.perf_counter()
        ts = [threading.Thread(target=_cp, args=("e", edges_df)),
              threading.Thread(target=_cp, args=("v", verts_df))]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        r["checkpoint"] = round(time.perf_counter() - t0, 3)
        r["e_parts"] = done["e"].rdd.getNumPartitions()
        r["v_parts"] = done["v"].rdd.getNumPartitions()

        from fermor_spark.graph import PropertyGraph
        g = PropertyGraph.from_dataframes(spark, done["e"], done["v"])
        sc.setJobDescription("profile: counts")
        t0 = time.perf_counter()
        ec = g.E.count()
        vc = g.V.count()
        r["counts"] = round(time.perf_counter() - t0, 3)
        r["e_rows"], r["v_rows"] = ec, vc

        # the bench window end-to-end, for the same rep epoch
        datasets._graph_cache.clear()
        for cp in (done["e"], done["v"]):
            try:
                cp.unpersist()
            except Exception:
                pass
        sc.setJobDescription("profile: bench window end-to-end")
        t0 = time.perf_counter()
        g2 = datasets.star_graph(spark, SF_DIR)
        g2.E.count()
        g2.V.count()
        r["bench_window"] = round(time.perf_counter() - t0, 3)
        out.append(r)
        print(json.dumps(r), flush=True)

    # join strategy of the bought join
    plan = edges_df._jdf.queryExecution().executedPlan().toString()
    bhj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    print(json.dumps({"bought_bhj": bhj, "bought_smj": smj}))
    print(json.dumps({"profile": out}))


if __name__ == "__main__":
    main()
