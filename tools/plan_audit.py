"""Physical-plan audit: captures the Catalyst evidence the scale design
relies on (pushdown, pruning, broadcasts, bucketed no-shuffle joins) into
PLANS.md. Run: python tools/plan_audit.py"""

from __future__ import annotations

import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fermor_spark import get_spark  # noqa: E402
from fermor_spark import queries as q  # noqa: E402
from fermor_spark.datasets import star_graph  # noqa: E402

SF = "/root/testdata/sf0.001"

# everything after this line in PLANS.md is hand-written audit evidence
# (round notes, A/B measurements) and survives regeneration
MARKER = "\n<!-- plan_audit: manual sections below are preserved -->\n"


def fmt_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    spark = get_spark(app_name="plan-audit", shuffle_partitions=8)
    lines = ["# PLANS — physical-plan audit evidence", ""]
    reg = q.all_queries()

    p = fmt_plan(reg["q1_pricing_summary"](spark, SF))
    lines += [
        "## Predicate pushdown + column pruning (q1_pricing_summary)",
        "```",
        *re.findall(r"PushedFilters: \[[^\]]*\]", p)[:1],
        *re.findall(r"ReadSchema: [^\n]*", p)[:1],
        "```", "",
    ]

    p = fmt_plan(reg["q3_shipping_priority"](spark, SF))
    lines += [
        "## Broadcast joins on dimensions (q3_shipping_priority)",
        "```",
        f"BroadcastHashJoin count: {p.count('BroadcastHashJoin')}",
        f"SortMergeJoin count: {p.count('SortMergeJoin')}",
        "```", "",
    ]

    g = star_graph(spark, SF)
    with tempfile.TemporaryDirectory() as tmp:
        g.save(f"{tmp}/g")
        from fermor_spark import PropertyGraph

        g2 = PropertyGraph.load(spark, f"{tmp}/g")
        p = fmt_plan(g2._edges_df("in_nation"))
        lines += [
            "## Per-label partition pruning on persisted edges",
            "```",
            *re.findall(r"PartitionFilters: \[[^\]]*\]", p)[:1],
            "```", "",
        ]
        g.save(f"{tmp}/bg", bucket_by_src=4)
        name = "fermor_edges_" + f"{tmp}/bg".strip("/").replace("/", "_").replace("-", "_").replace(".", "_")
        t = spark.table(name)
        p = fmt_plan(t.alias("a").join(t.alias("b"), "src").select("src"))
        buckets = re.findall(r"SelectedBucketsCount: [^\n]*", p)[:1]
        lines += [
            "## Bucketed co-located self-join (no shuffle)",
            "```",
            f"Exchange hashpartitioning occurrences: {p.count('Exchange hashpartitioning')}",
            f"SelectedBucketsCount: {buckets}",
            "```", "",
        ]
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    p = fmt_plan(reg["g_2hop_region"](spark, SF))
    lines += [
        "## Two-hop traversal = two joins in ONE plan (g_2hop_region)",
        "```",
        f"join operators: {p.count('Join')}, broadcast: {p.count('BroadcastHashJoin')}",
        "```", "",
    ]

    # Regenerate ONLY the auto-generated head; everything from the marker
    # on (eight rounds of appended audit notes and A/B measurements) is
    # preserved verbatim. Before this guard, a rerun overwrote the whole
    # file and would have destroyed the repo's accumulated plan evidence.
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PLANS.md")
    manual = ""
    if os.path.exists(path):
        existing = open(path).read()
        if MARKER in existing:
            manual = existing.split(MARKER, 1)[1]
        else:
            # legacy layout: manual notes start at the first round section
            m = re.search(r"^## Round ", existing, flags=re.M)
            if m:
                manual = "\n" + existing[m.start():]
    with open(path, "w") as f:
        f.write("\n".join(lines) + MARKER + manual)
    print("wrote PLANS.md (manual sections preserved)")


if __name__ == "__main__":
    main()
