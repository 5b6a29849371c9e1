"""g_pagerank_supply filter-in/filter-out A/B at sf0.1 (VERDICT r14 #1).

The r14 driver record shows g_pagerank_supply 0.428 -> 0.631 s (1.47x)
with one code change on the line: 359f76c's null-universe filter
(iterate.pagerank: `g.vertices_with_edge(labels).where(id.isNotNull())`).
The filter should be free — it fuses into the universe scan that the
count/collect pay anyway — but graph_build's 1.90x last round "should
have been free" too and got adjudicated only by a direct A/B. Same
convention here.

Interleaved A/B (same session, alternating reps): time the bench's exact
measurement window (`_force(g_pagerank_supply(spark, SF_DIR))`, fixture
warm, release_caches + GC drain between runs like bench.py's boundary)
with (A) the current pagerank (filter in) and (B) the r13 shape — the
universe's `.where` dropped via a vertices_with_edge proxy whose first
`.where()` is the identity. At sf0.1 the gate runs pagerank's LOCAL
finish (supplier->nation->region adjacency ~1k edges << threshold), so
the filter's only possible cost is in `universe.count()` and the
driver-side `universe.collect()`.

Run: python tools/exp_pagerank_ab.py [reps]
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fermor_spark import queries as q
from fermor_spark.graph import PropertyGraph
from fermor_spark.session import get_spark, release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_orig_vwe = PropertyGraph.vertices_with_edge


class _IdentityFirstWhere:
    """DataFrame proxy that turns the FIRST .where() into the identity —
    exactly strips pagerank's null-universe filter (the r13 shape) while
    leaving the rest of the plan untouched."""

    def __init__(self, df):
        self._df = df

    def where(self, cond):
        return self._df

    def __getattr__(self, k):
        return getattr(self._df, k)


def _vwe_unfiltered(self, *args, **kwargs):
    return _IdentityFirstWhere(_orig_vwe(self, *args, **kwargs))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="pagerank-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fermor_spark.datasets import TABLES, star_graph, table
    for t in TABLES:
        table(spark, SF_DIR, t).count()
    g = star_graph(spark, SF_DIR)  # fixture warm, like the bench session
    g.E.count()
    g.V.count()

    def floor_probe() -> float:
        t0 = time.perf_counter()
        for _ in range(24):
            spark.range(1024).repartition(32).count()
        return round(time.perf_counter() - t0, 3)

    gate = q.all_queries()["g_pagerank_supply"]

    def one_run() -> float:
        t0 = time.perf_counter()
        _force(gate(spark, SF_DIR))
        dt = round(time.perf_counter() - t0, 3)
        release_caches()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)
        return dt

    floor_start = floor_probe()
    one_run()  # shared warm-up (codegen + Arrow worker), never recorded
    a_times, b_times = [], []
    for r in range(reps):
        PropertyGraph.vertices_with_edge = _orig_vwe
        a_times.append(one_run())
        PropertyGraph.vertices_with_edge = _vwe_unfiltered
        b_times.append(one_run())
        print(f"rep {r}: A(filter-in)={a_times[-1]}  "
              f"B(filter-out)={b_times[-1]}", flush=True)
    PropertyGraph.vertices_with_edge = _orig_vwe
    floor_end = floor_probe()

    print(json.dumps({
        "sf_dir": SF_DIR, "floor_start": floor_start, "floor_end": floor_end,
        "A_filter_in": a_times, "B_filter_out": b_times,
        "A_best": min(a_times), "B_best": min(b_times),
        "A_median": sorted(a_times)[len(a_times) // 2],
        "B_median": sorted(b_times)[len(b_times) // 2],
        "ratio_best": round(min(a_times) / min(b_times), 3),
        "ratio_median": round(sorted(a_times)[len(a_times) // 2]
                              / sorted(b_times)[len(b_times) // 2], 3),
    }))


if __name__ == "__main__":
    main()
