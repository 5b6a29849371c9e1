"""Does the store-count lever (rocksdb_state state_partitions, r14) hold
at scale? The r14 A/B showed 8 stores beat 32 by ~3x on the sf0.1
tumbling drain — but that is KILOBYTES of state. A 100 TB deployment
sizes partitions UP with state volume; this experiment shows the
crossover exists, i.e. the lever is "size to state volume", not
"always use 8".

Method: session_aggregate (per-user session state — state keys scale
with distinct users, unlike tumbling's window x type keys) drained at
1x / 8x / 32x replicated events (user_id strided per replica, the
scale_probe growth shape: more users, not longer histories), each under
the RocksDB provider with 8 vs 32 state partitions. Best of 2 per cell.

Run: python tools/exp_state_partitions_scale.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fermor_spark import streaming as S
from fermor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_events(spark, m: int, out: str) -> None:
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    offs = {c: ev.agg(F.coalesce(F.max(c), F.lit(0))).collect()[0][0] + 1
            for c in ("event_id", "user_id")}
    parts = [ev.withColumn("event_id", F.col("event_id") + F.lit(r * offs["event_id"]))
               .withColumn("user_id", F.col("user_id") + F.lit(r * offs["user_id"]))
             for r in range(m)]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")


def drain_once(spark, sf_dir: str, parts: int, tag: str) -> float:
    ev = S.read_events_stream(spark, sf_dir)
    t0 = time.perf_counter()
    with S.rocksdb_state(spark, changelog=True, state_partitions=parts):
        S.run_to_memory(S.session_aggregate(ev), f"sps_{tag}",
                        output_mode="append",
                        expect_state_provider="rocksdb")
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark(app_name="state-partitions-scale")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results = {}
    seq = 0
    for m in (1, 8, 32):
        if m == 1:
            d = SF_DIR
            tmp = None
        else:
            tmp = tempfile.mkdtemp(prefix=f"sps_x{m}_")
            replicate_events(spark, m, tmp)
            d = tmp
        for parts in (8, 32):
            runs = []
            for _ in range(2):
                seq += 1
                runs.append(drain_once(spark, d, parts, f"{m}_{parts}_{seq}"))
            results[f"x{m}_p{parts}"] = runs
            print(f"x{m} parts={parts}: {runs}", flush=True)
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
