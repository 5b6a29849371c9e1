"""Plan contracts: physical-plan properties asserted as tests.

A correct result with a degraded plan is a silent 100-TB incident — these
tests pin the load-bearing plan shapes (scan pushdown, column pruning,
absence of cartesian/nested-loop joins, shuffle-free sampling) so a
refactor that breaks one fails CI instead of the cluster.
"""

import io
from contextlib import redirect_stdout

import pytest

from fermor_spark import queries as q

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def registry():
    # union: plan contracts apply to retired (parity-swept, benchable)
    # rows exactly as to gated ones — q19's disjunctive-pushdown pin
    # outlives its r14 retirement from the driver gate
    return {**q.all_queries(), **q.retired_queries()}


def test_q1_pushdown_and_pruning(spark, registry):
    p = plan_of(registry["q1_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # projection pruning: the 16-column lineitem scan reads only the 7 used
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]


def test_q19_disjunctive_pushdown_both_sides(spark, registry):
    p = plan_of(registry["q19_discounted_revenue"](spark, SF))
    assert p.count("Or(Or(And(") >= 2  # residuals pushed to BOTH scans
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_sampling_is_shuffle_free(spark, registry):
    p = plan_of(registry["sample_stratified_source"](spark, SF))
    assert "Exchange" not in p
    # column pruning: only (doc_id, source) of the 5 columns reach the query.
    # If another test cached a plan-identical documents read, the scan is an
    # InMemoryTableScan — pruning then shows as a 2-column Output instead of
    # the parquet ReadSchema.
    if "InMemoryTableScan" in p:
        assert "Output [2]: [doc_id" in p
    else:
        assert "struct<doc_id:bigint,source:string>" in p


def test_split_counts_single_shuffle(spark, registry):
    # hash_split + groupBy: exactly the one aggregation exchange
    p = plan_of(registry["sample_split_counts"](spark, SF))
    assert p.count("+- Exchange") == 1


def test_dedup_joins_are_keyed(spark, registry):
    # candidate generation must stay an equi-join on the blocking key —
    # never an all-pairs product
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard", "text_fingerprint_overlap"):
        p = plan_of(registry[name](spark, SF))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_two_hop_is_two_joins_one_plan(spark, registry):
    p = plan_of(registry["g_2hop_region"](spark, SF))
    # whole traversal is one Catalyst plan: no more than the 2 hop joins +
    # kind lookup; and the per-hop edge scans prune to the used labels
    assert "CartesianProduct" not in p


def test_dim_joins_broadcast(spark, registry):
    # q5 joins 4 dimensions: all should be broadcast, not sort-merge
    p = plan_of(registry["q5_local_supplier_volume"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 3


def test_tpch_r6_tail_plan_shapes(spark, registry):
    """The r6 TPC-H completions: dimension joins broadcast, predicates
    pushed to the scans, no cartesian/nested-loop product anywhere (q11's
    scalar-aggregate crossJoin is a broadcast of a 1-row frame — it plans
    as BroadcastNestedLoopJoin by construction and is exempt)."""
    for name in ("q2_min_cost_supplier", "q16_supplier_relationship",
                 "q20_potential_promotion"):
        plan = plan_of(registry[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "PushedFilters: [" in plan, name
        assert plan.count("BroadcastHashJoin") >= 1, name
    p11 = plan_of(registry["q11_important_stock"](spark, SF))
    assert "CartesianProduct" not in p11
    # the only nested-loop is the broadcast 1-row total (the q22 pattern);
    # formatted explain prints each node twice (tree + detail section)
    assert p11.count("BroadcastNestedLoopJoin") <= 2
    assert "PushedFilters: [" in p11


def test_tpch_tail_no_sort_merge_or_cartesian(spark, registry):
    """The 8 r5 TPC-H shapes must compile to broadcast/equi joins with
    pushed filters — no SortMergeJoin at toy SF (AQE downgrades), and
    never a cartesian/nested-loop product."""
    for name in ("q8_market_share", "q9_product_profit", "q15_top_supplier",
                 "q17_small_quantity_revenue", "q21_waiting_supplier",
                 "q22_idle_customers"):
        plan = plan_of(registry[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan or name == "q22_idle_customers", name
        assert "PushedFilters: [" in plan, name


def test_lsh_banding_single_scan(spark, registry):
    """LSH banding must be ONE explode projection — the per-band union
    re-evaluated the signature aggregation once per band per self-join
    side (the 16x recomputation fixed in r5). One Generate node per
    self-join leg, not bands-many signature aggregates."""
    from fermor_spark.pipeline import dedup

    # synthetic input: the documents-table shingle plan may be cached by
    # other tests, and CacheManager substitution changes the node counts
    d = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)],
        "doc_id long, text string")
    sigs = dedup.minhash_signatures(d, "doc_id", "text", 16)
    plan = plan_of(dedup.lsh_candidates(sigs, 8, 2))
    # the md5 signature aggregation must not be replicated per band: with
    # 8 bands the union form planned 16+ signature HashAggregate pairs;
    # the explode form needs only the per-leg partial/final pairs plus
    # the final distinct (~6 HashAggregate nodes total)
    assert plan.count("HashAggregate") <= 10, plan.count("HashAggregate")


def test_salted_join_has_no_skew_key_exchange(spark, registry):
    """skew.salted_join joins on (key, salt): the physical join keys must
    include the salt column so one hot key spreads across tasks."""
    plan = plan_of(registry["skew_salted_join_brands"](spark, SF))
    assert "_salt" in plan


def test_ensure_parallelism_semantics(spark):
    from fermor_spark.session import ensure_parallelism

    low = spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(1)
    spread = ensure_parallelism(low)
    assert spread.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert spread.count() == 100
    # already-parallel inputs pass through untouched (no extra shuffle)
    wide = spark.range(100).repartition(64)
    assert ensure_parallelism(wide) is wide


def test_id_tokens_repartition_gated_by_size(spark, monkeypatch, tmp_path):
    """_id_tokens only adds its keyed repartition when the source is BOTH
    under-parallel AND large enough to amortize the exchange — unconditional,
    it doubled the small-SF winnowing cold plan (r5 bench regression)."""
    from fermor_spark.pipeline import text as T

    # parquet-backed so Catalyst has a real size estimate (in-memory
    # LogicalRDDs report unknown size, which conservatively keeps the
    # scale-safe repartitioned path)
    spark.createDataFrame(
        [(i, "a b c d e") for i in range(10)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "docs"))
    small = spark.read.parquet(str(tmp_path / "docs"))
    # small under-parallel input: gate must SKIP the repartition
    plan = T._id_tokens(small, "doc_id", "text")._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "RepartitionByExpression" not in plan
    # same input claimed to be huge: gate must FIRE, hash-keyed on id
    monkeypatch.setattr(T, "_REPARTITION_MIN_BYTES", 0)
    plan_big = T._id_tokens(small, "doc_id", "text")._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "RepartitionByExpression" in plan_big and "id" in plan_big
    # already-parallel inputs never repartition regardless of size
    # (still claimed huge via the monkeypatched threshold)
    wide = small.repartition(64)
    plan_wide = T._id_tokens(wide, "doc_id", "text")._jdf.queryExecution() \
        .optimizedPlan().toString()
    # the input's own round-robin repartition stays; no keyed one is added
    assert "Repartition 64" in plan_wide
    assert "RepartitionByExpression" not in plan_wide


def test_managed_cache_release(spark):
    """Operators register query-scoped caches; release_caches() unpersists
    them all (the long-session / bench cache-hygiene contract)."""
    from fermor_spark import session as S

    df = spark.range(100)
    cached = S.managed_cache(df)
    assert cached.count() == 100
    assert cached.storageLevel.useMemory
    n = S.release_caches()
    assert n >= 1
    assert not cached.storageLevel.useMemory
    assert S.release_caches() == 0  # idempotent when empty


def test_duplicated_spans_plan_contract(spark, registry):
    """ESD span plan must stay 100% JVM (no Python eval node — the gram
    explosion is sequence+explode, not a UDF), read only (doc_id, text)
    from the documents scan, and push the length(text) >= k filter down
    as a data filter. Shuffles are bounded: gram-hash count aggregate,
    per-doc window, and (at test scale) a broadcast of the dup-gram set."""
    from fermor_spark.pipeline.dedup import duplicated_spans
    from fermor_spark.session import release_caches

    # the contract pins the operator's plan against the PARQUET SCAN, but
    # Spark's cache manager substitutes any matching plan fragment with an
    # earlier test's cached full-schema InMemoryRelation (cache lookup is
    # plan-based, not object-based) — clear the cache so the explain is
    # deterministic under any test order; cached fixtures elsewhere
    # degrade to lazy recompute, not breakage
    spark.catalog.clearCache()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(duplicated_spans(d, "doc_id", "text", k=20))
    release_caches()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "mapInPandas" not in p and "FlatMapGroupsInPandas" not in p
    scan_schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert scan_schemas and all(
        "lang" not in ln and "source" not in ln and "n_chars" not in ln
        for ln in scan_schemas)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_token_budget_window_is_source_keyed_no_global_sort(spark, registry):
    """token_budget's cumulative sum must run as ONE window over the
    source partitions: exactly one exchange keyed by source feeding the
    window, and no single-partition global sort (Exchange SinglePartition
    / rangepartitioning would serialize the corpus through one task)."""
    p = plan_of(registry["sample_token_budget"](spark, SF))
    assert "hashpartitioning(source" in p
    assert "rangepartitioning" not in p
    assert "Exchange SinglePartition" not in p
    assert p.count("Window") >= 1


def test_bloom_probe_is_broadcast_no_sort_merge(spark, registry):
    """The Bloom membership gate's probe side must stay map-side: the
    truth join is a BroadcastHashJoin and the plan has no SortMergeJoin
    or CartesianProduct — at 100 TB the probed table never shuffles; only
    the finished filter (a broadcast variable) and the distinct member
    keys move."""
    plan = plan_of(registry["sketch_bloom_membership"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_url_canonicalization_is_scan_stage_only(spark, registry):
    """URL canonicalization + literal-blocklist filtering is claimed to
    run at scan speed: the gate's plan must contain NO exchange, no
    join, and no Python evaluation — one codegen'd project over the
    parquet scan."""
    plan = plan_of(registry["pipeline_url_canonical"](spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_banding_plans_are_union_free(spark, registry):
    """r13 pin on the banding recompute trap (fixed 4× across rounds:
    lsh_candidates r12, incremental minhash c420cbe, simhash + minhash_lsh
    + lsh_topk tables + force-atlas replication r13): banded/replicated
    candidate generation must be ONE array-explode projection. A Union in
    these plans means per-band/table selects came back — each re-evaluates
    the expensive upstream (signature groupBy / corpus scan) once per
    band per join side, the silent 100-TB recompute incident."""
    for name in ["dedup_simhash_candidates", "dedup_minhash_lsh",
                 "events_funnel_conversion"]:
        p = plan_of(registry[name](spark, SF))
        assert "Union" not in p, f"{name}: banding/step union reappeared"

    from pyspark.sql import functions as F

    from fermor_spark.pipeline.dedup import (minhash_signatures,
                                             lsh_candidates)
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text") \
        .withColumnRenamed("doc_id", "id")
    sigs = minhash_signatures(d, "id", "text", num_hashes=8)
    assert "Union" not in plan_of(lsh_candidates(sigs, 4, 2))

    from fermor_spark.pipeline.similarity import lsh_topk
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = e.limit(3)
    assert "Union" not in plan_of(
        lsh_topk(e, qs, k=3, id_col="vec_id", vec_col="embedding",
                 num_planes=3, num_tables=4))


def test_gopher_repetition_single_window_pass(spark):
    """Plan contract for the r17 fully per-row gopher_repetition: every
    output is a per-document number, so the plan carries ZERO Window
    nodes, zero joins and zero aggregation shuffles — the dup-line stats
    are a run-length fold over the sorted line array and the top-n-gram
    char masses are run-length folds over sorted arrays_zip gram arrays,
    all behind single-row explode(array(...)) evaluation barriers (the
    line array, the dup fold, and the token array — the only three
    Generates). The pre-r17 shapes this pins against: the per-n loop's
    three window sorts over recomputed explodes, and the r13 lead-window
    + (id, n, ngram) count + struct-max form."""
    from fermor_spark.pipeline.text import gopher_repetition

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    import re as _re

    p = plan_of(gopher_repetition(d, "doc_id", "text"))
    # formatted explain prints each node once in the tree and once in the
    # detail section — count the detail headers "(NN) Window"
    n_window = len(_re.findall(r"\(\d+\) Window", p))
    n_generate = len(_re.findall(r"\(\d+\) Generate", p))
    assert n_window == 0, (n_window, p)
    assert "Union" not in p
    assert "Join" not in p
    assert n_generate <= 3, (n_generate, p)


def test_dedup_family_window_free(spark):
    """Plan contract for the KEPT r17 per-row dedup rewrites:
    shingle_table builds complete n-grams as arrays_zip slices of the
    barrier token array (no lead() windows) and ngram_jaccard's PPJoin
    prefix slices each doc's rarity-sorted shingle array in the row (no
    row_number/count window pair) — both plans carry ZERO Window nodes.

    The ESD span pair (duplicated_spans / cut_spans) is deliberately NOT
    pinned window-free anymore: its r17 per-row merge was adopted on a
    neutral local A/B and REVERTED in r18 after the VERDICT-mandated
    4x-SF tree A/B read it 1.13-1.32x slower than the window cascade
    (the per-doc collect_list of every duplicated position costs more
    than the window's partition sort, and the gap grows with SF). The
    spans plans are pinned to the measured window shape instead."""
    import re as _re

    from fermor_spark.pipeline.dedup import (cut_spans, duplicated_spans,
                                             ngram_jaccard_pairs,
                                             shingle_table)

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    for name, df in (
            ("shingle_table", shingle_table(d, "doc_id", "text", 3)),
            ("ngram_jaccard_pairs",
             ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)),
    ):
        p = plan_of(df)
        n_window = len(_re.findall(r"\(\d+\) Window", p))
        assert n_window == 0, (name, n_window)
    for name, df, max_w in (
            ("duplicated_spans",
             duplicated_spans(d, "doc_id", "text", k=20, min_count=2), 2),
            ("cut_spans",
             cut_spans(d, "doc_id", "text", k=20, min_count=2, min_span=40),
             2),
    ):
        p = plan_of(df)
        n_window = len(_re.findall(r"\(\d+\) Window", p))
        assert 1 <= n_window <= max_w, (name, n_window)


def test_doc_stats_project_below_generate(spark):
    """Plan contract for the r15 per-exploded-row recompute fix: in
    gopher_quality / quality_score / gopher_repetition, the doc-level
    statistic expressions (split + filter lambdas + regexp over the full
    text) must sit in a Project BELOW the token/line Generate, evaluating
    once per document. A single select(stats..., explode(...)) puts them
    ABOVE the Generate where they re-evaluate once per exploded row —
    measured 5x on gopher_quality at sf0.1 and the mechanism behind its
    three-record driver drift (r12-r14)."""
    from fermor_spark.pipeline.text import (gopher_quality,
                                            gopher_repetition,
                                            quality_score)

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # markers are the EXPENSIVE doc-level expressions (not the alias names:
    # float grouping keys reprint as `knownfloatingpointnormalized(...) AS
    # _alpha` inside the partial aggregate, a false positive above the
    # Generate). Plans print root-first, so below-the-Generate = a LARGER
    # string index than the Generate that consumes the stats.
    from fermor_spark.pipeline.text import c4_filters

    # gopher_repetition (r17 per-row dup-line fold): the per-line explode
    # is gone — the run-length fold rides a single-row explode(array(
    # aggregate(...))) barrier and the doc-length stat _tc sits below it,
    # evaluated once per document by construction.
    for fn, gen_marker, stat_marker in (
            (gopher_quality, "Generate", "regexp_replace"),
            (quality_score, "Generate", "regexp_replace"),
            (c4_filters, "Generate", "regexp_replace"),
            (gopher_repetition, "Generate explode(array(aggregate",
             "AS _tc")):
        plan = fn(d, "doc_id", "text")._jdf.queryExecution() \
            .executedPlan().toString()
        gen_i = plan.find(gen_marker)
        stat_i = plan.find(stat_marker)
        assert gen_i != -1 and stat_i != -1, (fn.__name__, plan[:500])
        assert stat_i > gen_i, (
            f"{fn.__name__}: doc-stat expression '{stat_marker}' appears "
            f"ABOVE the Generate — re-evaluates per exploded row")


def test_square_count_single_wedge_pass(spark, registry):
    """square_count must compute the wedge join ONCE: per-pair wedge
    multiplicity m comes from a single Window over (a, z), and the three
    credit streams (both endpoints + middle) explode out of that one
    pass. The pre-r16 shape referenced the un-persisted wedge join from
    FOUR subtrees (40 Exchange nodes at gate shape vs 13 now) — at scale
    the wedge set dwarfs the edge set and recomputing it is the same
    recompute class as the r15 Generate fix."""
    import re as _re

    p = plan_of(registry["g_square_count_bipartite"](spark, SF))
    assert len(_re.findall(r"\(\d+\) Window", p)) == 1, p
    assert len(_re.findall(r"\(\d+\) Generate", p)) == 1, p
    n_exch = len(_re.findall(r"\(\d+\) Exchange", p))
    assert n_exch <= 20, f"wedge recompute came back: {n_exch} exchanges"


def test_broadcast_frontier_pins_build_side(spark, registry):
    """broadcast_frontier() must make every hop join a BroadcastHashJoin
    that builds the FRONTIER side in the INITIAL plan (no AQE repair
    needed, no edge-side exchange), stick through chained hops and
    carried columns, and leave the un-hinted default untouched. The r15
    recommender measurement: un-hinted, AQE fixed the SortMergeJoins only
    after the edge shuffle map stages ran and built the EDGE side."""
    import re as _re

    from fermor_spark.datasets import star_graph

    g = star_graph(spark, SF)
    cust = g.vertices("customer").where("id = 'c:1'")
    hinted = cust.broadcast_frontier().out("in_nation").in_("in_nation")
    p = plan_of(hinted.df)
    assert len(_re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 2, p
    assert "SortMergeJoin" not in p
    # the hinted build side is the frontier projection (_fid), never __e_
    assert "BuildLeft" in p or "BuildRight" in p
    # recommender gate carries the pin end to end: all three hop joins
    # (plus the kind lookup) broadcast in the INITIAL plan; the one
    # SortMergeJoin left is the anti-join against the full bought table
    # (its 590k-row right side has no compile-time stats and must not be
    # frontier-hinted — at 100 TB it stays a shuffle by design)
    p2 = plan_of(registry["g_recommender"](spark, SF))
    assert len(_re.findall(r"\(\d+\) BroadcastHashJoin", p2)) >= 3, p2
    assert len(_re.findall(r"\(\d+\) SortMergeJoin", p2)) <= 1, p2


def test_point_filters_auto_broadcast_frontier(spark):
    """is_/one_of bound the frontier by a literal id list, so they
    auto-apply a ONE-HOP broadcast hint — the immediately following hop
    must be an initial-plan BroadcastHashJoin, but the hint is CONSUMED
    by that hop (after an expansion the frontier is unbounded and a
    forced broadcast could OOM the driver at scale). The negated filters
    (isnt/none_of) leave the default, and the explicit
    broadcast_frontier() opt-in stays sticky."""
    import re as _re

    from fermor_spark.datasets import star_graph

    g = star_graph(spark, SF)
    hop = g.vertices("nation").one_of(["n:1", "n:5"]).out("in_region")
    p = plan_of(hop.df)
    assert len(_re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 1, p
    assert "SortMergeJoin" not in p
    # the auto hint survives intermediate filters but not the hop itself
    filtered = g.vertices().is_("n:1").where("id IS NOT NULL")
    assert getattr(filtered, "_bcast_auto", False)
    assert not getattr(filtered, "_broadcast_frontier", False)
    hopped = g.vertices().is_("n:1").out("in_region")
    assert not getattr(hopped, "_bcast_auto", True)
    hopped_both = g.vertices().is_("n:1").both("in_region")
    assert not getattr(hopped_both, "_bcast_auto", True)
    # siblings builds from its hop result too (ADVICE r16 medium): the
    # pre-r17 shape rebuilt from the PRE-hop route, resurrecting the
    # spent hint for the next hop over an unbounded expanded frontier
    hopped_sib = g.vertices().one_of(["n:1", "n:5"]).siblings("in_region")
    assert not getattr(hopped_sib, "_bcast_auto", True)
    # ...while the sticky explicit opt-in still propagates through it
    sticky_sib = g.vertices().is_("n:1").broadcast_frontier().siblings("in_region")
    assert getattr(sticky_sib, "_broadcast_frontier", False)
    # explicit opt-in is sticky through hops
    sticky = g.vertices().is_("n:1").broadcast_frontier().out("in_region")
    assert getattr(sticky, "_broadcast_frontier", False)
    # negated filters stay un-hinted
    assert not getattr(g.vertices().isnt("n:1"), "_bcast_auto", False)
    assert not getattr(g.vertices().none_of(["n:1"]), "_bcast_auto", False)


def test_bounded_broadcast_guards_the_hint(spark):
    """bounded_broadcast attaches the broadcast hint ONLY when the side
    is provably small — the r17-ready replacement for the two deferred
    OOM-class forced broadcasts (of_kind/vertices(kind) against V, the
    k-core round frontier; PLANS.md r16 forced-broadcast audit). A
    too-large side must come back as the SAME un-hinted frame so
    Catalyst/AQE own the join strategy."""
    from fermor_spark.hints import bounded_broadcast

    big = spark.range(100).selectExpr("cast(id as string) id")
    small = spark.range(5).selectExpr("cast(id as string) id")

    # probe path: over the bar -> identity (no hint object created)
    assert bounded_broadcast(big, max_rows=10) is big
    # probe path: under the bar -> hinted (visible in the analyzed plan)
    hinted = bounded_broadcast(small, max_rows=10)
    assert hinted is not small
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()

    # known_rows skips the probe and is taken as the caller's bound
    assert bounded_broadcast(big, max_rows=10, known_rows=11) is big
    assert bounded_broadcast(big, max_rows=10, known_rows=10) is not big

    # hinted and un-hinted joins agree on results
    left = spark.range(50).selectExpr("cast(id as string) id", "id * 2 as v")
    a = sorted(left.join(bounded_broadcast(small, max_rows=10), "id").collect())
    b = sorted(left.join(small, "id").collect())
    assert a == b and len(a) == 5


def test_kind_scan_sites_are_size_guarded(spark):
    """r17 flip of the r16 audit's deferred OOM class: vertices(kind) and
    Route.of_kind hint the (id, kind) V slice ONLY under the graph's
    memoized probe bound. Under the bar (every gate graph) the plan
    keeps the pre-flip BroadcastHashJoin; faking an over-the-bar probe
    must drop the hint (Catalyst/AQE own the join) with equal values."""
    from fermor_spark.datasets import star_graph

    g = star_graph(spark, SF)
    # under the bar: kind scan broadcasts in the INITIAL plan, and the
    # analyzed plan carries the explicit hint node
    p = plan_of(g.vertices("nation").df)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "ResolvedHint" in \
        g.vertices("nation").df._jdf.queryExecution().analyzed().toString()
    # the probe is memoized per graph (keyed to the live V frame)
    assert g._v_probe_cache[0] is g.V
    want_v = sorted(r["id"] for r in g.vertices("nation").df.collect())
    want_k = sorted(r["id"] for r in
                    g.vertices().of_kind("nation").df.collect())

    # fake an over-the-bar probe: hint gone on BOTH sites, values equal
    g._v_probe_cache = (g.V, 10**9)
    over_v = g.vertices("nation").df
    over_k = g.vertices().of_kind("nation").df
    assert "ResolvedHint" not in \
        over_v._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in \
        over_k._jdf.queryExecution().analyzed().toString()
    assert sorted(r["id"] for r in over_v.collect()) == want_v
    assert sorted(r["id"] for r in over_k.collect()) == want_k


def test_kcore_frontier_guard_wired(spark, monkeypatch):
    """r17: k_core's delta leg routes its frontier through
    bounded_broadcast with the loop's own per-round surviving-degree
    count as known_rows (fr ⊆ deg ⇒ the bound is sound and free). Wiring
    is asserted by interception, and forcing the guard to refuse the
    hint (the at-scale path) must leave the peel result unchanged."""
    from fermor_spark import iterate
    from tests.fixtures import edges_graph

    g = edges_graph(
        spark, "to",
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
    )
    want = {r["id"]: r["deg"] for r in
            iterate.k_core(g, k=2, local_edge_threshold=0).collect()}
    assert want == {"a": 2, "b": 2, "c": 2}

    seen = []

    def refuse(df, max_rows=None, known_rows=None, **kw):
        seen.append(known_rows)
        return df  # over-the-bar behavior: no hint, Catalyst/AQE plan it

    monkeypatch.setattr(iterate, "bounded_broadcast", refuse)
    got = {r["id"]: r["deg"] for r in
           iterate.k_core(g, k=2, local_edge_threshold=0).collect()}
    assert got == want
    # called once per peel round, always with the caller-known bound
    assert seen and all(n is not None and n >= 0 for n in seen)


def test_bounded_broadcast_bytes_guard(spark):
    """ADVICE r16: rows alone don't prove broadcast-safety — 1M rows of
    a wide frame blows the 64 MB the row bar reasons from. The static
    schema estimate must refuse wide frames at row counts the row bar
    would pass, refuse narrow frames whose row count implies > max_bytes,
    and stay job-free (known_rows path runs zero Spark jobs)."""
    from fermor_spark.hints import (_estimated_row_bytes, bounded_broadcast)

    narrow = spark.range(5).selectExpr("cast(id as string) id")
    wide = spark.range(5).selectExpr(
        "cast(id as string) id", "array_repeat(id, 10) emb",
        "named_struct('a', id, 'b', cast(id as string)) meta")

    # estimates: narrow = one string; wide adds two nested columns
    assert _estimated_row_bytes(narrow) == 64
    assert _estimated_row_bytes(wide) == 64 + 512 + 512

    # same known_rows: the narrow frame hints, the wide one refuses
    kr = 200_000  # narrow: 12.8 MB est; wide: ~217 MB est
    assert bounded_broadcast(narrow, known_rows=kr) is not narrow
    assert bounded_broadcast(wide, known_rows=kr) is wide
    # a tighter max_bytes binds before the row bar even for narrow frames
    assert bounded_broadcast(narrow, known_rows=kr,
                             max_bytes=1 << 20) is narrow
