"""Loaders for the driver testdata tables and the derived star property graph.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, parquet under /root/testdata/sf*/.

The star graph re-expresses the relational schema as a property graph so the
graph operator surface can be exercised (and oracle-checked) on real data:

    c:{custkey}   -[in_nation]->  n:{nationkey}
    s:{suppkey}   -[supp_nation]-> n:{nationkey}
    n:{nationkey} -[in_region]->  r:{regionkey}
    o:{orderkey}  -[placed_by]->  c:{custkey}
    c:{custkey}   -[bought]->     p:{partkey}     (distinct customer×part)
    o:{orderkey}  -[contains]->   p:{partkey}     (one edge per lineitem row)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fermor_spark.graph import PropertyGraph

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_table_cache: dict[tuple[str, str], DataFrame] = {}
_graph_cache: dict[str, PropertyGraph] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # keyed by application id: a cached DataFrame from a stopped/previous
    # SparkSession must never leak into a new one
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _table_cache:
        if name == "events":
            # events.parquet has carried either TIMESTAMP(NANOS) — which Spark's
            # vectorized parquet reader only accepts as long via nanosAsLong —
            # or plain timestamp[us]. Branch on the dtype actually read:
            # nanosAsLong leaves non-NANOS timestamp columns untouched (NTZ).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            from pyspark.sql.types import LongType, TimestampType
            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, LongType):
                # integer division — double division of int64 nanos loses the
                # final microsecond to 53-bit mantissa rounding
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
            elif not isinstance(ts_type, TimestampType):
                # TIMESTAMP_NTZ → session-tz timestamp; session tz is pinned
                # UTC (session.py) so the cast preserves wall-clock and
                # matches the DuckDB oracle's NTZ read
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            _table_cache[key] = df
        else:
            _table_cache[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _table_cache[key]


def _id(prefix: str, col) -> F.Column:
    return F.concat(F.lit(prefix + ":"), col.cast("string"))


def star_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """PropertyGraph over the star schema; cached per sf_dir (the `forked`
    boundary — built once, amortized over all queries)."""
    gkey = (spark.sparkContext.applicationId, sf_dir)
    if gkey in _graph_cache:
        return _graph_cache[gkey]
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    supp = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def edge(df, label, src, dst, weight=None):
        cols = [
            F.lit(label).alias("label"),
            src.alias("src"),
            dst.alias("dst"),
            (weight if weight is not None else F.lit(None)).cast("double").alias("weight"),
            F.lit(None).cast("string").alias("doc"),
        ]
        return df.select(*cols)

    # shuffle join on purpose: orders is only broadcast-sized at toy SFs,
    # and AQE already downgrades to broadcast at runtime when the actual
    # post-projection size clears the threshold — forcing it here would
    # pin a plan that dies at cluster scale
    bought = (
        orders.select("o_orderkey", "o_custkey")
        .join(li.select("l_orderkey", "l_partkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    edges = (
        edge(cust, "in_nation", _id("c", F.col("c_custkey")), _id("n", F.col("c_nationkey")))
        .unionByName(edge(supp, "supp_nation", _id("s", F.col("s_suppkey")), _id("n", F.col("s_nationkey"))))
        .unionByName(edge(nation, "in_region", _id("n", F.col("n_nationkey")), _id("r", F.col("n_regionkey"))))
        .unionByName(edge(orders, "placed_by", _id("o", F.col("o_orderkey")), _id("c", F.col("o_custkey"))))
        .unionByName(edge(bought, "bought", _id("c", F.col("o_custkey")), _id("p", F.col("l_partkey"))))
        .unionByName(edge(li, "contains", _id("o", F.col("l_orderkey")), _id("p", F.col("l_partkey")),
                          weight=F.col("l_quantity")))
    )

    def vtx(df, prefix, idcol, kind):
        return df.select(
            _id(prefix, F.col(idcol)).alias("id"),
            F.lit(kind).alias("kind"),
            F.lit(None).cast("string").alias("doc"),
        )

    vertices = (
        vtx(cust, "c", "c_custkey", "customer")
        .unionByName(vtx(nation, "n", "n_nationkey", "nation"))
        .unionByName(vtx(region, "r", "r_regionkey", "region"))
        .unionByName(vtx(supp, "s", "s_suppkey", "supplier"))
        .unionByName(vtx(part, "p", "p_partkey", "part"))
        .unionByName(vtx(orders, "o", "o_orderkey", "order"))
    )
    # materialize via localCheckpoint, not .cache(): the columnar cache's
    # encode pass costs ~2.5x the checkpoint's block store for the same
    # reuse speed (measured at sf0.1: 3.3s vs 1.2s materialize, 0.17s
    # recount either way). The tradeoff is recomputability on block loss —
    # acceptable for a derived fixture the loader can rebuild; a production
    # deployment persists the graph with g.save() (bucketed Parquet, the
    # bench's g_2hop_bucketed path) instead of keeping executor-memory
    # copies of a 100 TB edge set. E and V materialize CONCURRENTLY (two
    # driver threads, one Spark job each — neither job saturates the
    # cluster alone; measured 4.3s -> 2.0s at sf0.1).
    import threading

    done: dict = {}
    errors: list[BaseException] = []

    def _cp(key, df):
        # capture worker failures: an exception swallowed here would surface
        # later as a bare KeyError('e'/'v') with the real cause on stderr
        try:
            done[key] = df.localCheckpoint(eager=True)
        except BaseException as exc:  # noqa: BLE001 — re-raised after join
            errors.append(exc)

    ts = [threading.Thread(target=_cp, args=("e", edges)),
          threading.Thread(target=_cp, args=("v", vertices))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errors:
        raise errors[0]
    g = PropertyGraph.from_dataframes(spark, done["e"], done["v"], cache=False)
    _graph_cache[gkey] = g
    return g
