"""k-core peel-batching A/B (VERDICT r17 #4).

g_kcore_distributed pays 23 peel rounds = 23 persist+count barrier jobs
at the bench fixture; the round count is the cost. This measures the one
batching idea VERDICT asks for — delta-batch ``depth`` peels lazily
before each re-checkpoint (the iterated-degree fixpoint per round),
preserving exactness — against the shipped flat loop, interleaved in one
session so a shared-VM episode hits both arms equally.

The batched variant chains ``depth`` frontier/delta steps as lazy plans
over the persisted degree table and materializes ONCE per batch; the
convergence check (count unchanged over a whole batch ⟺ every chained
frontier was empty ⟺ fixed point) is exact because a non-empty frontier
strictly removes rows. Output equality is asserted against the flat
loop's result on every rep before timing is trusted.

A depth-2/3 EXPLICIT-PERSIST chain was measured and rejected in r5
(9.96 s / 8.45 s vs 7.33 s flat — PLANS.md "k-core r5"); this re-runs
the question on the r17 loop shape (incremental frontier peeling +
bounded_broadcast semi-joins) per VERDICT's measure-then-decide bar.

Run: python tools/exp_kcore_batch_ab.py [depth] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fermor_spark import datasets, iterate
from fermor_spark.hints import bounded_broadcast
from fermor_spark.iterate import _persist, _step_edges
from fermor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def k_core_batched(g, k: int, depth: int, labels=None, max_iters: int = 500):
    """The flat loop with ``depth`` lazily chained peel steps per
    materialization. Semantics: identical — each chained step is exactly
    one flat-loop round; a batch whose total row count is unchanged had
    every chained frontier empty."""
    e = _persist(
        _step_edges(g, labels, "both")
        .where(F.col("u") != F.col("v"))
        .select("u", "v")
        .distinct()
    )
    deg = _persist(
        e.groupBy("u").agg(F.count("*").alias("deg")).withColumnRenamed("u", "id"))
    n = deg.count()
    batches = 0
    while batches * depth < max_iters:
        cur = deg
        for _ in range(depth):
            fr = cur.where(F.col("deg") < k).select("id")
            delta = (
                e.join(bounded_broadcast(fr.withColumnRenamed("id", "u"),
                                         known_rows=n), "u", "left_semi")
                .groupBy(F.col("v").alias("id")).agg(F.count("*").alias("_d"))
            )
            cur = (
                cur.join(fr, "id", "left_anti")
                .join(delta, "id", "left")
                .select("id", (F.col("deg") - F.coalesce(F.col("_d"), F.lit(0)))
                        .alias("deg"))
            )
        new_deg = _persist(cur)
        m = new_deg.count()
        batches += 1
        deg.unpersist()
        deg = new_deg
        if m == n:
            break
        n = m
    e.unpersist()
    return deg.select("id", "deg"), batches


def main() -> None:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="kcore-batch-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in datasets.TABLES:
        datasets.table(spark, SF_DIR, t).count()

    from fermor_spark.queries import _ring_chain_graph
    g = _ring_chain_graph(spark, SF_DIR)
    g.E.count()

    def run_flat():
        out = iterate.k_core(g, k=2, local_edge_threshold=0)
        rows = sorted((r["id"], r["deg"]) for r in out.collect())
        return rows, iterate.LAST_KCORE_ROUNDS

    def run_batched():
        out, batches = k_core_batched(g, k=2, depth=depth)
        rows = sorted((r["id"], r["deg"]) for r in out.collect())
        return rows, batches

    # untimed warm-up of both arms + the equality assertion
    base_rows, base_rounds = run_flat()
    b_rows, b_batches = run_batched()
    assert b_rows == base_rows, "batched variant diverged from flat k_core"
    print(json.dumps({"warmup": True, "flat_rounds": base_rounds,
                      "batched_batches": b_batches, "depth": depth,
                      "rows": len(base_rows)}), flush=True)

    for rep in range(reps):
        for arm, fn in (("flat", run_flat), ("batched", run_batched)):
            t0 = time.perf_counter()
            rows, rounds = fn()
            dt = round(time.perf_counter() - t0, 3)
            assert rows == base_rows
            print(json.dumps({"rep": rep, "arm": arm, "sec": dt,
                              "rounds_or_batches": rounds}), flush=True)


if __name__ == "__main__":
    main()
