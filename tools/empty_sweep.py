#!/usr/bin/env python3
"""Degenerate-input robustness sweep: run EVERY registered gate query
against a degraded copy of the testdata tables and report, per query:

Three modes:
  --mode empty   (default) zero-row tables, same schemas (limit 0)
  --mode nulls   ~10% of the CONTENT columns nulled (documents.text/lang/
                 source, embeddings.embedding, events.event_type/value/
                 props/ts, graph FK columns — deterministic hash pick,
                 PKs left intact): the shape of a real crawl where
                 extraction failed, language id abstained, an event
                 arrived partial, or a row is an orphan
  --mode extreme documents.text replaced (by doc_id class) with the
                 hostile shapes a crawl actually yields — empty string,
                 whitespace-only, one 50k-char token, a 5k-token wall,
                 control chars, emoji/CJK multibyte, 2000 one-char
                 lines — and events.props with truncated JSON

Per query:

  ok      — ran, returned rows (some gates synthesize their own fixture
            data and legitimately produce rows even on empty inputs) or
            an empty result, with the SAME result schema as at sf0.001
            (the production contract: an incremental pipeline run over an
            empty partition must not crash and must not change schema)
  named   — raised an intentional, named error (ValueError/RuntimeError
            with a message) — evidence-gate assertions that exist to
            prove a fixture exercised a path; acceptable but listed
  crash   — raised an opaque error (TypeError, IndexError, Py4J
            internals, AnalysisException from schema inference, numpy
            shape errors) — these are real production bugs: the exact
            class the r13 null-dim-probe fix came from

Usage:
    python tools/empty_sweep.py [--queries name ...] [--report out.json]

The zero-row tables are built once into --work-dir from --sf-dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# intentional, named gate errors (evidence assertions / loud contracts)
NAMED = (ValueError, RuntimeError, AssertionError)


NULL_COLS = {
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding"],
    "events": ["event_type", "value", "props", "ts"],
    # graph FKs: an orphan row (extraction produced no parent) is the
    # realistic dirty shape — a null key must drop out of joins, never
    # crash a builder or traversal. PKs stay intact.
    "customer": ["c_nationkey"],
    "orders": ["o_custkey"],
    "lineitem": ["l_suppkey", "l_partkey"],
    "supplier": ["s_nationkey"],
}


def build_empty(spark, sf_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.mode(
            "overwrite").parquet(f"{out_dir}/{t}.parquet")


def build_nulls(spark, sf_dir: str, out_dir: str, frac: float = 0.1) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    buckets = max(1, int(round(1 / frac)))
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for c in NULL_COLS.get(t, []):
            # deterministic, per-column-offset pick so different columns
            # null DIFFERENT rows (and some rows carry several nulls)
            pick = F.abs(F.xxhash64(F.concat_ws(
                ":", F.lit(c), *[F.col(k).cast("string")
                                 for k in df.columns[:1]]))) % buckets == 0
            df = df.withColumn(
                c, F.when(pick, F.lit(None).cast(df.schema[c].dataType))
                .otherwise(F.col(c)))
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def build_extreme(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "documents":
            cls = F.col("doc_id") % 50
            hostile = (
                F.when(cls == 0, F.lit(""))
                .when(cls == 1, F.lit(" \n\t \n "))
                .when(cls == 2, F.lit("x" * 50000))
                .when(cls == 3, F.lit("tok " * 5000))
                .when(cls == 4, F.lit("\x00\x01\x02 control \x7f chars"))
                .when(cls == 5, F.lit("😀 emoji ✓ ünïcödé 中文 text"))
                .when(cls == 6, F.lit("a\n" * 2000))
                .otherwise(F.col("text")))
            df = df.withColumn("text", hostile)
        if t == "events":
            df = df.withColumn(
                "props",
                F.when(F.col("event_id") % 20 == 0, F.lit('{"unterminated'))
                .otherwise(F.col("props")))
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


_BUILDERS = {"empty": build_empty, "nulls": build_nulls,
             "extreme": build_extreme}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--mode", choices=["empty", "nulls", "extreme"],
                    default="empty")
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--queries", nargs="+", default=None)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()
    if args.work_dir is None:
        args.work_dir = f"/tmp/fermor_{args.mode}_sf"
    if args.report is None:
        args.report = f"/tmp/{args.mode}_sweep.json"

    from fermor_spark import queries as Q
    from fermor_spark.session import get_spark, release_caches

    spark = get_spark(app_name="empty-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(
            os.path.join(args.work_dir, f"{TABLES[-1]}.parquet", "_SUCCESS")):
        print(f"building {args.mode} tables -> {args.work_dir}",
              file=sys.stderr)
        _BUILDERS[args.mode](spark, args.sf_dir, args.work_dir)

    # retired rows (r14) keep degenerate-input coverage too — the sweep
    # walks the union, same as the parity test and bench
    union = {**Q.QUERIES, **Q.RETIRED_QUERIES}
    names = args.queries or list(union)
    report: dict = {}
    counts = {"ok": 0, "named": 0, "crash": 0}
    for name in names:
        fn = union[name]
        entry: dict = {}
        try:
            ref_schema = fn(spark, args.sf_dir).schema.simpleString()
        except Exception:
            # the reference run itself failing is out of scope here (the
            # parity suite owns that); skip rather than misattribute
            entry = {"status": "skip", "why": "sf0.001 run failed"}
            report[name] = entry
            release_caches()
            continue
        release_caches()
        try:
            df = fn(spark, args.work_dir)
            n = df.count()
            schema = df.schema.simpleString()
            same = schema == ref_schema
            entry = {"status": "ok" if same else "crash",
                     "rows": n, "schema_stable": same}
            if not same:
                entry["why"] = f"schema drift: {schema} != {ref_schema}"
        except NAMED as e:
            entry = {"status": "named",
                     "why": f"{type(e).__name__}: {str(e)[:200]}"}
        except Exception as e:
            entry = {"status": "crash",
                     "why": f"{type(e).__name__}: {str(e)[:300]}",
                     "trace": traceback.format_exc()[-1500:]}
        counts[entry.get("status", "ok")] = counts.get(
            entry.get("status", "ok"), 0) + 1
        print(json.dumps({"query": name, **{k: v for k, v in entry.items()
                                            if k != "trace"}}), flush=True)
        report[name] = entry
        release_caches()

    with open(args.report, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"\nsummary: {counts} -> {args.report}")
    return 0 if counts.get("crash", 0) == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
