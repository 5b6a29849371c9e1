"""Corpus sinks: partitioned parquet writes for curated training data.

The write side of the pipeline story: a curated corpus lands partitioned by
its downstream access keys (split, lang, source, ...) so every later reader
— tokenizer training on `train`, eval decontamination on `test`, per-language
mixing — gets partition PRUNING instead of a full scan. File sizes are
bounded by maxRecordsPerFile (executor-memory-safe Arrow batches for
re-readers) and each partition directory is written by the tasks that own
its rows — no global sort, no driver collection.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("split", "lang"),
    max_records_per_file: int | None = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a curated corpus as parquet partitioned by ``partition_by``.

    Scale notes: partition columns become directory keys (pruned at read
    planning time — a `split='train'` reader never lists val/test files);
    ``max_records_per_file`` splits oversized task outputs WITHOUT a
    shuffle (the writer rolls files), bounding any downstream reader's
    per-file memory. Dynamic partition overwrite is left to the session
    config — callers replacing one split set
    spark.sql.sources.partitionOverwriteMode=dynamic.
    """
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_corpus(spark, path: str, schema=None) -> DataFrame:
    """Read a corpus written by write_corpus (partition columns recovered
    from directory keys; predicate pushdown on them is pruning). Pass
    ``schema`` (the written frame's schema) to make reading a VACUOUS
    corpus well-defined — an empty partitioned write leaves no data files
    to infer from."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def write_corpus_jsonl(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("split",),
    compression: str | None = "gzip",
    max_records_per_file: int | None = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write a corpus as JSON Lines — the interchange format LLM-corpus
    tooling consumes (one JSON object per line). Same scale rules as the
    parquet sink: partition columns become pruned directory keys, file
    sizes are bounded WITHOUT a shuffle, each task writes its own rows.
    gzip (splittable-enough at bounded file sizes; files roll at
    max_records_per_file) keeps text corpora ~5-10x smaller on the wire.
    Parquet remains the internal format — JSONL is the export/ingest
    boundary."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_corpus_jsonl(spark, path: str, schema=None) -> DataFrame:
    """Read a JSONL corpus directory (or any newline-delimited JSON tree,
    e.g. an external dataset drop). Passing ``schema`` skips the inference
    scan — REQUIRED practice at 100 TB (schema inference reads every file
    twice) and the only well-defined behavior for empty partitions."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
