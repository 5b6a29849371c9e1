"""One-off experiment: reproduce the r8->r9 streaming-gate creep
(es_tumbling 1.47->2.03, es_file_sink 1.94->2.42 driver-to-driver, code
unchanged). Runs the streaming bench lines in bench.py's harness shape
(warm-up + 3 timed, boundary GC drain) and prints per-run sequences, with
optional session-level streaming configs injected first via env:

    FERMOR_EXP_STREAM_CONF=1 python tools/exp_streaming_creep.py
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fermor_spark import get_spark  # noqa: E402
from fermor_spark import queries as q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = ["events_streaming_tumbling", "events_streaming_file_sink",
         "events_streaming_sessions", "pipeline_streaming_curation"]


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="exp-stream-creep")
    if os.environ.get("FERMOR_EXP_STREAM_CONF"):
        spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
        print("# forceDeleteTempCheckpointLocation=true", flush=True)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from fermor_spark.datasets import TABLES, table
    for t in TABLES:
        table(spark, SF_DIR, t).count()
    from fermor_spark.session import release_caches
    registry = q.all_queries()
    for rep in range(2):  # run the whole block twice: creep ACROSS queries
        for name in NAMES:
            runs = []
            for i in range(4):
                t0 = time.perf_counter()
                _force(registry[name](spark, SF_DIR))
                runs.append(round(time.perf_counter() - t0, 2))
            print(f"rep{rep} {name}: {runs}", flush=True)
            release_caches()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)


if __name__ == "__main__":
    main()
