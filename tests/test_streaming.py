"""Structured Streaming tests: each streaming result is checked against the
equivalent batch computation over the same events parquet (the batch analogs
are themselves oracle-checked in test_oracle_parity)."""

import pytest
from pyspark.sql import functions as F

from fermor_spark import streaming
from fermor_spark.datasets import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return table(spark, SF, "events").cache()


def _drain(spark, sdf, name, mode="append"):
    streaming.run_to_memory(sdf, name, output_mode=mode)
    return spark.table(name)


def test_stream_tumbling_matches_batch(spark, batch_events):
    s = streaming.read_events_stream(spark, SF)
    # complete mode: every window emitted -> exact batch equality
    out = _drain(spark, streaming.tumbling_counts(s), "t_tumbling", mode="complete")
    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
           for r in out.collect()}
    exp_df = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("t"))
    )
    exp = {(r["w"]["start"], r["event_type"]): (r["n"], r["t"]) for r in exp_df.collect()}
    assert got == exp


def test_append_mode_holds_back_open_windows(spark, batch_events):
    """Watermark semantics: append mode only emits windows closed by the
    final watermark (max_ts - 2h); later windows stay in state."""
    s = streaming.read_events_stream(spark, SF)
    out = _drain(spark, streaming.tumbling_counts(s), "t_tumbling_append")
    emitted = {(r["window_start"], r["event_type"]) for r in out.collect()}
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    exp_df = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "event_type")
    )
    all_windows = {(r["ws"], r["event_type"]): r["we"] for r in exp_df.collect()}
    import datetime
    wm = max_ts - datetime.timedelta(hours=2)
    closed = {k for k, we in all_windows.items() if we <= wm}
    assert emitted == closed
    assert len(closed) < len(all_windows)  # some windows were genuinely held


def test_stream_sessions_match_batch(spark, batch_events):
    s = streaming.read_events_stream(spark, SF)
    out = _drain(spark, streaming.session_aggregate(s), "t_sessions", mode="complete")
    got = {(r["user_id"], r["session_start"]): r["n_events"] for r in out.collect()}
    exp_df = (
        batch_events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    exp = {(r["user_id"], r["w"]["start"]): r["n"] for r in exp_df.collect()}
    assert got == exp


def test_stream_dedup(spark, batch_events):
    s = streaming.read_events_stream(spark, SF)
    out = _drain(spark, streaming.dedup_within_watermark(s, ["user_id", "event_type"]),
                 "t_dedup")
    # one row per (user_id, event_type) present in the data
    exp = batch_events.select("user_id", "event_type").distinct().count()
    assert out.count() == exp


def test_running_user_totals(spark, batch_events):
    s = streaming.read_events_stream(spark, SF)
    out = _drain(spark, streaming.running_user_totals(s), "t_running", mode="update")
    # final state per user (last update) must equal the batch totals
    from pyspark.sql import Window
    latest = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value")
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 2))
           for r in latest.collect()}
    exp_df = batch_events.groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
    exp = {r["user_id"]: (r["n"], r["t"]) for r in exp_df.collect()}
    assert got == exp


def test_stream_static_enrichment_matches_batch(spark, batch_events):
    """Stream-static broadcast join: every micro-batch row picks up its
    dimension attributes — equal to the batch left join."""
    dim = spark.createDataFrame(
        [("purchase", 1.0), ("click", 0.1), ("view", 0.05)],
        "event_type string, weight double")
    s = streaming.read_events_stream(spark, SF)
    out = _drain(spark, streaming.enrich_with_dimension(s, dim, "event_type"), "t_enrich")
    got = {(r["event_id"], r["weight"]) for r in out.select("event_id", "weight").collect()}
    exp = {(r["event_id"], r["weight"])
           for r in batch_events.join(dim, "event_type", "left")
           .select("event_id", "weight").collect()}
    assert got == exp and len(exp) > 0


def test_stream_stream_self_join_matches_batch(spark, batch_events):
    """Stream-stream interval self-join: same pairs as the batch range
    self-join over users ≤ 50 (the subset keeps the pair count sane)."""
    s = streaming.read_events_stream(spark, SF).where(F.col("user_id") <= 50)
    out = _drain(spark, streaming.self_join_within(s, minutes=10), "t_selfjoin")
    got = {(r["first_event_id"], r["second_event_id"], r["gap_seconds"])
           for r in out.collect()}
    e = batch_events.where(F.col("user_id") <= 50)
    a, b = e.alias("a"), e.alias("b")
    exp_df = a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                    & (F.col("b.ts") > F.col("a.ts"))
                    & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")))
    exp = {(r["fe"], r["se"], r["g"]) for r in exp_df.select(
        F.col("a.event_id").alias("fe"), F.col("b.event_id").alias("se"),
        (F.unix_timestamp("b.ts") - F.unix_timestamp("a.ts")).alias("g")).collect()}
    assert got == exp and len(exp) > 0


def test_streaming_curation_matches_batch(spark):
    """The curation front-end (lang gate + token-length gate + hash split)
    is stateless column logic, so streaming output must equal the batch
    operators applied to the same table — row for row."""
    s = streaming.read_documents_stream(spark, SF)
    out = _drain(spark, streaming.streaming_curation(s), "t_curation")
    got = {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()}

    from fermor_spark.pipeline.sample import hash_split
    from fermor_spark.pipeline.text import tokens
    d = table(spark, SF, "documents")
    batch = hash_split(
        d.where((F.col("lang") == "en") & (F.size(tokens(F.col("text"))) >= 20)),
        "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    exp = {(r["doc_id"], r["split"]) for r in batch.select("doc_id", "split").collect()}
    assert got == exp and len(exp) > 0


def test_running_totals_multibatch_negative_values(spark, tmp_path):
    """ADVICE r6 #2 scenario: a multi-batch drain over data whose values go
    NEGATIVE makes per-user totals non-monotone across update emissions, so
    aggregating max(n_events) and max(total_value) independently pairs a
    stale max total with the final count. The gate's max_by pairing (select
    the total from the update row carrying the max n_events — the final
    state row, since counts are strictly monotone) must match the batch sum."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    batches = [
        pd.DataFrame({"user_id": [1, 2], "value": [10.0, 3.0]}),
        pd.DataFrame({"user_id": [1, 2], "value": [-5.0, 4.0]}),
        pd.DataFrame({"user_id": [1], "value": [-2.0]}),
    ]
    for i, pdf in enumerate(batches):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            str(src / f"b{i}"))
    sdf = (spark.readStream.schema("user_id long, value double")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src) + "/*"))
    out = _drain(spark, streaming.running_user_totals(sdf),
                 "t_running_negative", mode="update")
    # multiple update emissions per user must exist for the test to bite
    assert out.where(F.col("user_id") == 1).count() > 1
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4))
           for r in out.groupBy("user_id").agg(
               F.max("n_events").alias("n_events"),
               F.round(F.max_by("total_value", "n_events"), 4)
               .alias("total_value")).collect()}
    assert got == {1: (3, 3.0), 2: (2, 7.0)}
    # the independent-max pairing the gate moved OFF of is provably wrong here
    bad = {r["user_id"]: round(r["mx"], 4)
           for r in out.groupBy("user_id").agg(
               F.max("total_value").alias("mx")).collect()}
    assert bad[1] == 10.0  # stale max total != final state total 3.0


def test_file_sink_matches_memory_sink(spark, batch_events, tmp_path):
    """Draining the same watermarked tumbling aggregate to a checkpointed
    JSON file sink must land exactly the rows the memory sink emits —
    file commits (_spark_metadata), partition recovery, and the JSON
    timestamp round trip add nothing and lose nothing."""
    s1 = streaming.read_events_stream(spark, SF)
    mem = _drain(spark, streaming.tumbling_counts(s1), "t_file_vs_mem")
    s2 = streaming.read_events_stream(spark, SF)
    streaming.run_to_files(
        streaming.tumbling_counts(s2), str(tmp_path / "out"),
        str(tmp_path / "cp"), fmt="json", partition_by=["event_type"])
    back = spark.read.schema(
        "window_start timestamp, n_events long, total_value double, "
        "event_type string").json(str(tmp_path / "out"))
    key = lambda r: (r.window_start, r.event_type, r.n_events,  # noqa: E731
                     round(r.total_value, 4))
    assert sorted(map(key, back.collect())) == sorted(map(key, mem.collect()))
    assert back.count() > 0


def test_streaming_incremental_dedup_matches_batch(spark, tmp_path):
    """incremental_exact_dedup_stream over a multi-micro-batch file
    drain produces EXACTLY the batch operator's novelty verdicts —
    Bloom misses short-circuit as novel, Bloom hits resolve by
    stream-static text equality (a forced-collision hash makes every
    row a hit, so the verify leg is load-bearing for every verdict)."""
    from pyspark.sql import functions as F

    from fermor_spark.pipeline.dedup import (incremental_exact_dedup,
                                             incremental_exact_dedup_stream)
    from fermor_spark.streaming import run_to_memory

    corpus = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(40)], "doc_id long, text string")
    arriving = [(100 + i, f"text-{i * 3}") for i in range(20)] \
        + [(200 + i, f"novel-{i}") for i in range(10)]
    new_df = spark.createDataFrame(arriving, "doc_id long, text string")
    src = str(tmp_path / "landing")
    new_df.repartition(3).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    out = incremental_exact_dedup_stream(stream, corpus, "doc_id", "text")
    assert out.isStreaming
    run_to_memory(out, "inc_dedup_stream")
    got = {r["doc_id"]: r["is_new"]
           for r in spark.table("inc_dedup_stream").collect()}
    want = {r["doc_id"]: r["is_new"] for r in incremental_exact_dedup(
        new_df, corpus, "doc_id", "text").collect()}
    assert got == want and len(got) == len(arriving)
    assert got[100] is False and got[200] is True
    # total-collision hash: every row bloom-hits, text equality decides
    run_to_memory(incremental_exact_dedup_stream(
        stream, corpus, "doc_id", "text",
        hash_col=lambda c: F.lit("x")), "inc_dedup_stream2")
    got2 = {r["doc_id"]: r["is_new"]
            for r in spark.table("inc_dedup_stream2").collect()}
    assert got2 == want


def test_streaming_warc_to_curated_files_exactly_once(spark):
    """The production crawl loop end to end (VERDICT r10 #8): WARC
    landing zone → streaming record walk → HTML text extraction →
    checkpointed JSON corpus sink. Draining twice with no new input
    lands NOTHING new (checkpoint + _spark_metadata commit log =
    exactly-once, same contract events_streaming_file_sink gates);
    landing new crawl files and re-draining appends exactly the new
    records with their payload text intact."""
    import os
    import shutil
    import tempfile

    from fermor_spark.pipeline import warc
    from fermor_spark.pipeline.html import html_to_text
    from fermor_spark.streaming import run_to_files

    def pages(ids):
        return [(f"http://x.example/{i}",
                 (f"<html><head><title>T{i}</title></head><body>"
                  f"<article><p>doc {i} text here</p></article>"
                  "</body></html>").encode("utf-8")) for i in ids]

    tmp = tempfile.mkdtemp()
    landing, out, cp = f"{tmp}/landing", f"{tmp}/corpus", f"{tmp}/cp"
    try:
        warc.write_warc(
            spark.createDataFrame(pages(range(10)),
                                  "url string, payload binary"),
            landing, n_files=2, compress=True)

        def drain():
            s = warc.read_warc_stream(spark, landing,
                                      max_files_per_trigger=1)
            ex = html_to_text(s, col="payload")
            run_to_files(ex.select("url", "extracted_text"), out, cp,
                         fmt="json")

        def corpus():
            return {r["url"]: r["extracted_text"] for r in spark.read
                    .schema("url string, extracted_text string")
                    .json(out).collect()}

        drain()
        got1 = corpus()
        assert len(got1) == 10
        assert got1["http://x.example/3"] == "doc 3 text here"
        assert os.path.isdir(f"{out}/_spark_metadata")   # the commit log
        drain()                       # nothing new landed → no-op batch
        assert corpus() == got1      # exactly-once: no dup rows appended
        # new crawl files land (unique names — a landing zone appends,
        # never overwrites); the third drain picks up ONLY them
        warc.write_warc(
            spark.createDataFrame(pages(range(10, 15)),
                                  "url string, payload binary"),
            f"{tmp}/b2", n_files=1, compress=True)
        for f in os.listdir(f"{tmp}/b2"):
            shutil.move(f"{tmp}/b2/{f}", f"{landing}/b2-{f}")
        drain()
        got3 = corpus()
        assert len(got3) == 15 and all(got3[u] == t1 for u, t1 in
                                       got1.items())
        assert got3["http://x.example/12"] == "doc 12 text here"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_warc_multi_batch_exact(spark):
    """read_warc_stream drains a landing directory through REAL
    micro-batches (maxFilesPerTrigger=1 over 3 files) and reproduces
    every payload byte — the batch record walk running unchanged as a
    stateless streaming transform."""
    import shutil
    import tempfile

    from fermor_spark.pipeline import warc
    from fermor_spark.streaming import run_to_memory

    rows = [(f"http://x.example/{i}", f"doc{i}-é".encode("utf-8"))
            for i in range(30)]
    df = spark.createDataFrame(rows, "url string, payload binary")
    tmp = tempfile.mkdtemp()
    try:
        warc.write_warc(df, f"{tmp}/landing", n_files=3, compress=True)
        s = warc.read_warc_stream(spark, f"{tmp}/landing",
                                  max_files_per_trigger=1)
        assert s.isStreaming
        run_to_memory(s.select("url", "payload"), "swarc_test")
        got = {r["url"]: bytes(r["payload"])
               for r in spark.table("swarc_test").collect()}
        assert got == dict(rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_rocksdb_provider_parity(spark, batch_events):
    """The whole stateful family produces IDENTICAL results under the
    RocksDB state store provider (the 100 TB state backend — off-heap,
    disk-backed, changelog-checkpointed) as under the default heap-backed
    provider: state-store choice is an ops knob, never a semantics knob.
    Also pins that the provider class is actually available in this Spark
    build (rocksdbjni ships inside spark-core)."""
    cases = {
        "tumbling": lambda s: streaming.tumbling_counts(s),
        "sessions": lambda s: streaming.session_aggregate(s),
        "dedup": lambda s: streaming.dedup_within_watermark(
            s, ["user_id", "event_type"]),
        "user_state": lambda s: streaming.running_user_totals(s),
        "self_join": lambda s: streaming.self_join_within(s),
    }
    results: dict = {}
    for provider in ("default", "rocksdb"):
        ctx = streaming.rocksdb_state(spark) if provider == "rocksdb" else None
        if ctx:
            ctx.__enter__()
        try:
            modes = {"tumbling": "complete", "user_state": "update"}
            for case, build in cases.items():
                s = streaming.read_events_stream(spark, SF)
                out = _drain(spark, build(s), f"t_rp_{provider}_{case}",
                             mode=modes.get(case, "append"))
                results[(provider, case)] = sorted(
                    tuple(r) for r in out.collect())
        finally:
            if ctx:
                ctx.__exit__(None, None, None)
    # scoped restore: the session is back on the default provider
    assert spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "default-ish") != streaming.ROCKSDB_PROVIDER
    for case in cases:
        assert results[("default", case)] == results[("rocksdb", case)], case
        assert results[("default", case)], f"{case} drained zero rows (vacuous)"


def test_read_events_stream_directory_table(spark):
    """A Spark-WRITTEN events table is a directory of part files; the
    single-file symlink-dir exposure listed zero files through the
    symlinked subdirectory (file listing does not descend), silently
    draining an empty stream — found by the r14 state-scale experiment.
    Directory-shaped tables must stream directly and yield every row."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="dir_events_")
    try:
        src = spark.read.parquet(f"{SF}/events.parquet")
        n = src.count()
        src.repartition(4).write.mode("overwrite").parquet(
            f"{d}/events.parquet")
        s = streaming.read_events_stream(spark, d)
        assert s.isStreaming
        streaming.run_to_memory(s.select("event_id"), "t_dir_events")
        assert spark.table("t_dir_events").count() == n
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_run_to_memory_provider_telemetry(spark):
    """expect_state_provider='rocksdb' passes when the scope covers query
    start and RAISES when the query ran on the default heap store — the
    per-call guard the driver-gated rocksdb row relies on (a scope bug
    would otherwise silently fall back and still hash-match)."""
    import pytest

    s = streaming.read_events_stream(spark, SF)
    with streaming.rocksdb_state(spark):
        streaming.run_to_memory(streaming.tumbling_counts(s), "t_tel_ok",
                                expect_state_provider="rocksdb")
    assert spark.table("t_tel_ok").count() > 0

    s2 = streaming.read_events_stream(spark, SF)
    with pytest.raises(RuntimeError, match="RocksDB state store"):
        streaming.run_to_memory(streaming.tumbling_counts(s2), "t_tel_bad",
                                expect_state_provider="rocksdb")

    # stateless drain + expectation: no stateOperators is also a failure
    s3 = streaming.read_events_stream(spark, SF)
    with streaming.rocksdb_state(spark), \
            pytest.raises(RuntimeError, match="no stateful operators"):
        streaming.run_to_memory(s3.select("event_id", "user_id"),
                                "t_tel_stateless",
                                expect_state_provider="rocksdb")

    # zero rows drained (empty partition) is vacuously OK — the store was
    # never exercised and the production contract forbids crashing there
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="tel_empty_sf_")
    try:
        spark.read.parquet(f"{SF}/events.parquet").limit(0) \
            .write.mode("overwrite").parquet(f"{d}/events.parquet")
        s4 = streaming.read_events_stream(spark, d)
        with streaming.rocksdb_state(spark):
            streaming.run_to_memory(streaming.tumbling_counts(s4),
                                    "t_tel_empty",
                                    expect_state_provider="rocksdb")
        assert spark.table("t_tel_empty").count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scoped_confs_restores_applied_keys_on_partial_failure():
    """If conf.set raises partway through the apply loop, __exit__ never
    runs — scoped_confs must restore the already-applied keys itself
    before re-raising, or they leak into the session permanently
    (ADVICE r14). Pure-python via a stub conf."""
    import pytest

    class StubConf:
        def __init__(self):
            self.vals = {"a": "1"}

        def get(self, k):
            if k in self.vals:
                return self.vals[k]
            raise Exception("no such conf")

        def set(self, k, v):
            if k == "boom":
                raise RuntimeError("non-modifiable conf")
            self.vals[k] = v

        def unset(self, k):
            self.vals.pop(k, None)

    class StubSpark:
        conf = StubConf()

    stub = StubSpark()
    with pytest.raises(RuntimeError, match="non-modifiable"):
        # dicts preserve insertion order: 'a' and 'b' apply, 'boom' raises
        with streaming.scoped_confs(stub, {"a": "2", "b": "9", "boom": "x"}):
            raise AssertionError("body must not run")
    assert stub.conf.vals == {"a": "1"}  # 'a' restored, 'b' unset


def test_scoped_confs_partial_failure_does_not_mask_or_abort():
    """ADVICE r15: the failing key must NOT be recorded in _prev before
    set() raises — for a non-modifiable conf the restore would raise
    AGAIN inside the unwind, masking the original exception and aborting
    the restore of the keys that did apply. And one unrestorable key in
    __exit__ must not abort restoring the rest."""
    import pytest

    class StubConf:
        def __init__(self):
            self.vals = {"a": "1", "boom": "locked", "c": "3"}

        def get(self, k):
            if k in self.vals:
                return self.vals[k]
            raise Exception("no such conf")

        def set(self, k, v):
            if k == "boom":
                raise RuntimeError("non-modifiable conf")
            self.vals[k] = v

        def unset(self, k):
            self.vals.pop(k, None)

    class StubSpark:
        conf = StubConf()

    stub = StubSpark()
    # 'a' applies, 'boom' raises on set AND would raise again on restore:
    # the ORIGINAL RuntimeError must propagate and 'a' must be restored
    with pytest.raises(RuntimeError, match="non-modifiable"):
        with streaming.scoped_confs(stub, {"a": "2", "boom": "x", "c": "9"}):
            raise AssertionError("body must not run")
    assert stub.conf.vals["a"] == "1"
    assert stub.conf.vals["c"] == "3"  # never applied

    # clean-body exit with one unrestorable key: the other keys still
    # restore, and the restore error surfaces (not swallowed)
    class StickyConf(StubConf):
        def set(self, k, v):
            if k == "sticky" and self.vals.get("sticky") == "applied":
                raise RuntimeError("cannot restore sticky")
            self.vals[k] = v

    class StickySpark:
        conf = StickyConf()

    s2 = StickySpark()
    s2.conf.vals = {"sticky": "orig", "z": "0"}
    with pytest.raises(RuntimeError, match="cannot restore sticky"):
        with streaming.scoped_confs(s2, {"sticky": "applied", "z": "9"}):
            pass
    assert s2.conf.vals["z"] == "0"  # restored despite sticky's failure


def test_rocksdb_guard_vacuity_defeated_by_retained_state():
    """The vacuity guard must treat retained state (lastProgress
    stateOperators numRowsTotal) as proof the store was exercised even
    when recentProgress has evicted every row-carrying batch (bounded at
    numRecentProgressUpdates, default 100) — a long drain on the heap
    store must still RAISE, not silently skip the provider assertion
    (ADVICE r14). Stub query: heap-store state retained, all
    recentProgress entries row-free (the evicted-batches shape)."""
    import pytest

    class StubQuery:
        lastProgress = {"stateOperators": [
            {"operatorName": "stateStoreSave", "numRowsTotal": 42,
             "customMetrics": {}}]}
        recentProgress = [{"numInputRows": 0}] * 3

    with pytest.raises(RuntimeError, match="RocksDB state store"):
        streaming._assert_rocksdb_provider(StubQuery(), "t_evicted")

    # truly-empty drain (no retained state, no input) stays vacuous
    class EmptyQuery:
        lastProgress = {"stateOperators": [
            {"operatorName": "stateStoreSave", "numRowsTotal": 0,
             "customMetrics": {}}]}
        recentProgress = [{"numInputRows": 0}]

    streaming._assert_rocksdb_provider(EmptyQuery(), "t_empty")
