"""ForceAtlas2-derived graph layout as DataFrame iterations.

The reference's layout engine (src/fermor/force_atlas.clj:37-192) runs
repulsion (local, within radius), strong gravity, and weighted edge
attraction over mutable per-vertex documents with a ForkJoin fold. The
Spark-native shape is message passing: each force source produces
(id, fx, fy) message rows, one groupBy sums them, positions are
recomputed columns (mutable docs → recompute-and-replace, SURVEY §7).

Repulsion is grid-bucketed (cell + 8 neighbors within `radius`), the
scale-safe approximation of the reference's local-repulsion mode — O(V²)
all-pairs repulsion does not survive 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fermor_spark.graph import PropertyGraph


def init_positions(g: PropertyGraph, seed: int = 42) -> DataFrame:
    """(id, x, y) deterministic pseudo-random initial layout."""
    ids = g.vertex_ids()
    hx = F.xxhash64(F.col("id"), F.lit(seed))
    hy = F.xxhash64(F.col("id"), F.lit(seed + 1))
    return ids.select(
        "id",
        ((hx % 2000) / 100.0).alias("x"),
        ((hy % 2000) / 100.0).alias("y"),
    )


def force_atlas_step(
    g: PropertyGraph,
    positions: DataFrame,
    labels=None,
    gravity: float = 0.05,
    repulsion: float = 1.0,
    attraction: float = 0.2,
    weight_influence: float = 1.0,
    radius: float = 40.0,
    speed: float = 0.1,
) -> DataFrame:
    """One simulation step → new (id, x, y).

    Three message sources (attraction along edges, grid-local repulsion,
    gravity) → one groupBy-sum → position update. Iterate by calling in a
    loop with localCheckpoint every few steps (lineage discipline as in
    fermor_spark.iterate).
    """
    pos = positions.select("id", "x", "y")

    # --- attraction along edges (weight^influence), both directions
    e = g._edges_df(labels).select(
        "src", "dst", F.coalesce(F.col("weight"), F.lit(1.0)).alias("w")
    )
    pa = pos.select(F.col("id").alias("src"), F.col("x").alias("sx"), F.col("y").alias("sy"))
    pb = pos.select(F.col("id").alias("dst"), F.col("x").alias("dx_"), F.col("y").alias("dy_"))
    ew = e.join(pa, "src").join(pb, "dst").withColumn(
        "k", F.pow(F.col("w"), F.lit(weight_influence)) * attraction
    )
    attr = ew.select(
        F.col("src").alias("id"),
        (F.col("k") * (F.col("dx_") - F.col("sx"))).alias("fx"),
        (F.col("k") * (F.col("dy_") - F.col("sy"))).alias("fy"),
    ).unionByName(
        ew.select(
            F.col("dst").alias("id"),
            (F.col("k") * (F.col("sx") - F.col("dx_"))).alias("fx"),
            (F.col("k") * (F.col("sy") - F.col("dy_"))).alias("fy"),
        )
    )

    # --- grid-bucketed local repulsion (cells of size `radius`; each vertex
    # replicated into its 3×3 cell neighborhood on one side of the join)
    cell = pos.select(
        "id", "x", "y",
        F.floor(F.col("x") / radius).cast("long").alias("cx"),
        F.floor(F.col("y") / radius).cast("long").alias("cy"),
    )
    offsets = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]
    replicated = None
    for i, j in offsets:
        part = cell.select(
            F.col("id").alias("oid"), F.col("x").alias("ox"), F.col("y").alias("oy"),
            (F.col("cx") + i).alias("cx"), (F.col("cy") + j).alias("cy"),
        )
        replicated = part if replicated is None else replicated.unionByName(part)
    pairs = cell.join(replicated, ["cx", "cy"]).where(F.col("id") != F.col("oid"))
    d2 = (F.col("x") - F.col("ox")) ** 2 + (F.col("y") - F.col("oy")) ** 2
    rep = pairs.withColumn("d2", F.greatest(d2, F.lit(0.01))).where(
        F.col("d2") <= radius * radius
    ).select(
        "id",
        (repulsion * (F.col("x") - F.col("ox")) / F.col("d2")).alias("fx"),
        (repulsion * (F.col("y") - F.col("oy")) / F.col("d2")).alias("fy"),
    )

    # --- strong gravity toward the origin
    grav = pos.select(
        "id", (-gravity * F.col("x")).alias("fx"), (-gravity * F.col("y")).alias("fy")
    )

    forces = attr.unionByName(rep).unionByName(grav).groupBy("id").agg(
        F.sum("fx").alias("fx"), F.sum("fy").alias("fy")
    )
    return (
        pos.join(forces, "id", "left")
        .select(
            "id",
            (F.col("x") + speed * F.coalesce(F.col("fx"), F.lit(0.0))).alias("x"),
            (F.col("y") + speed * F.coalesce(F.col("fy"), F.lit(0.0))).alias("y"),
        )
    )


def force_atlas(g: PropertyGraph, iterations: int = 50, labels=None,
                seed: int = 42, **params) -> DataFrame:
    """Run the layout to `iterations` steps → final (id, x, y).

    Positions are checkpointed EVERY step: a step references the position
    frame five times (edge ends, grid cells, gravity, update join), so plan
    size quintuples per un-truncated iteration — lineage discipline here is
    what makes 800-iteration runs (the reference's UI workload) feasible.
    """
    pos = init_positions(g, seed)
    for i in range(iterations):
        new = force_atlas_step(g, pos, labels=labels, **params).localCheckpoint(eager=True)
        if i > 0:
            pos.unpersist()
        pos = new
    return pos
