"""Dump .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/explain_dump.py <tag> <suffix> [query ...]
  tag     directory under plans/ (e.g. r17)
  suffix  'before' or 'after' (file name becomes <query>_<suffix>.txt)
  query   registered or retired query names; default = the bench list

Plans are captured at sf0.001 (plan SHAPE is SF-invariant; building the
frame is cheap there) with the bench's shuffle-partition default so the
Exchange/ join-strategy evidence matches what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fermor_spark import get_spark  # noqa: E402
from fermor_spark import queries as q  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def fmt_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    reg = {**q.all_queries(), **q.retired_queries()}
    if not names:
        from bench import BENCH_QUERIES
        names = BENCH_QUERIES
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-dump")
    from fermor_spark.session import release_caches
    for name in names:
        try:
            df = reg[name](spark, SF)
            plan = fmt_plan(df)
        except Exception as exc:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        release_caches()


if __name__ == "__main__":
    main()
