"""graph_build filter-in/filter-out A/B at sf0.1 (VERDICT r13 #1).

The r13 driver record shows graph_build 3.30 -> 6.27 s (1.90x) with one
code change on that line: e1a6889's null-endpoint filters. In star_graph
the filter lands in from_dataframes AFTER the localCheckpoint, so g.E is
select(cast)+where over the checkpoint, and the bench's g.E.count() pays
a full projection+filter scan instead of a bare checkpoint iteration.

Interleaved A/B (same session, alternating): build the sf0.1 star graph
and time the bench's exact measurement window (star_graph + E.count +
V.count) with (A) the current from_dataframes (filter in) and (B) a
monkeypatched from_dataframes without the where (r12 behavior). Fresh
graph/table caches per rep; the checkpoint fixture caches are cleared so
each rep rebuilds.

Run: python tools/exp_graph_build_ab.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fermor_spark import datasets
from fermor_spark.graph import PropertyGraph
from fermor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_orig_from_dataframes = PropertyGraph.from_dataframes.__func__


def _from_dataframes_nofilter(cls, spark, edges, vertices=None, cache=False):
    """r12-shape construction: cast-select only, no null-endpoint where."""
    cols = edges.columns
    e = edges.select(
        F.col("label").cast("string"),
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
        (F.col("weight").cast("double") if "weight" in cols
         else F.lit(None).cast("double")).alias("weight"),
        (F.col("doc").cast("string") if "doc" in cols
         else F.lit(None).cast("string")).alias("doc"),
    )
    v = None
    if vertices is not None:
        vcols = vertices.columns
        v = vertices.select(
            F.col("id").cast("string"),
            (F.col("kind").cast("string") if "kind" in vcols
             else F.lit(None).cast("string")).alias("kind"),
            (F.col("doc").cast("string") if "doc" in vcols
             else F.lit(None).cast("string")).alias("doc"),
        )
    if cache:
        e = e.cache()
        if v is not None:
            v = v.cache()
    return cls(spark, v, e, forked=True,
               materialized_vertices=vertices is not None)


def one_build(spark) -> float:
    datasets._graph_cache.clear()
    t0 = time.perf_counter()
    g = datasets.star_graph(spark, SF_DIR)
    g.E.count()
    g.V.count()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="graph-build-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fermor_spark.datasets import TABLES, table
    for t in TABLES:
        table(spark, SF_DIR, t).count()
    # floor probe, same shape as bench.py
    t0 = time.perf_counter()
    for _ in range(24):
        spark.range(1024).repartition(32).count()
    floor = round(time.perf_counter() - t0, 3)

    a_times, b_times = [], []
    for r in range(reps):
        # A: filter in (current head)
        PropertyGraph.from_dataframes = classmethod(_orig_from_dataframes)
        a_times.append(one_build(spark))
        # B: filter out (r12 shape)
        PropertyGraph.from_dataframes = classmethod(_from_dataframes_nofilter)
        b_times.append(one_build(spark))
        print(f"rep {r}: A(filter-in)={a_times[-1]}  B(filter-out)={b_times[-1]}",
              flush=True)
    PropertyGraph.from_dataframes = classmethod(_orig_from_dataframes)
    import json
    print(json.dumps({
        "sf_dir": SF_DIR, "sched_floor": floor,
        "A_filter_in": a_times, "B_filter_out": b_times,
        "A_best": min(a_times), "B_best": min(b_times),
        "ratio_best": round(min(a_times) / min(b_times), 3),
    }))


if __name__ == "__main__":
    main()
