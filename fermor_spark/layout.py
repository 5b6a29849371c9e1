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


def _force_messages(
    g: PropertyGraph,
    pos: DataFrame,
    labels,
    gravity: float,
    repulsion: float,
    attraction: float,
    weight_influence: float,
    radius: float,
) -> DataFrame:
    """Summed force messages → (id, fx, fy). Three message sources
    (attraction along edges, grid-local repulsion, gravity) → one
    groupBy-sum."""

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
    # ONE array-explode replication into the 3×3 neighborhood, not a
    # union of 9 per-offset selects (each re-evaluating the position
    # lineage once per offset per iteration — the banding recompute trap)
    offsets = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]
    replicated = cell.select(
        F.col("id").alias("oid"), F.col("x").alias("ox"), F.col("y").alias("oy"),
        F.explode(F.array(*[
            F.struct((F.col("cx") + i).alias("cx"), (F.col("cy") + j).alias("cy"))
            for i, j in offsets
        ])).alias("nb"),
    ).select("oid", "ox", "oy",
             F.col("nb.cx").alias("cx"), F.col("nb.cy").alias("cy"))
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

    return attr.unionByName(rep).unionByName(grav).groupBy("id").agg(
        F.sum("fx").alias("fx"), F.sum("fy").alias("fy")
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
    """One constant-speed simulation step → new (id, x, y).

    Iterate by calling in a loop with localCheckpoint every few steps
    (lineage discipline as in fermor_spark.iterate); `force_atlas` below
    adds the reference's adaptive speed on top.
    """
    pos = positions.select("id", "x", "y")
    forces = _force_messages(
        g, pos, labels, gravity, repulsion, attraction, weight_influence, radius
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
                seed: int = 42, adaptive: bool = True,
                jitter_tolerance: float = 0.02, **params) -> DataFrame:
    """Run the layout to `iterations` steps → final (id, x, y).

    `adaptive=True` reproduces the reference's swinging/traction speed
    adaptation (src/fermor/force_atlas.clj:37-42, 104-119) in message-
    passing form. Per step, with v = this step's force-accumulated velocity
    and p = the previous step's (undamped) velocity:

      swinging = Σ |p − v|          (oscillation: direction reversals)
      traction = Σ ½|p + v|         (coherent motion)

    — two scalar aggregates (one tiny collect per iteration, same
    driver-coordination cost as a convergence probe). The global speed
    chases `jitter_tolerance · efficiency · traction / swinging` with the
    reference's guard rails (halve efficiency when swinging/traction > 2,
    damp 0.7 on chaos, cap the per-step rise at 50%), each vertex applies
    `speed / (1 + √(speed·|p−v|))` — swinging vertices slow down
    individually — and velocity carries over with friction
    `clamp(1 − 0.05·traction/V^1.8, 0.2, 0.95)` (mass simplified to 1;
    the reference's degree-derived mass is a documented delta).

    Positions are checkpointed EVERY step: a step references the state
    frame several times (edge ends, grid cells, gravity, update join), so
    plan size multiplies per un-truncated iteration — lineage discipline
    here is what makes 800-iteration runs (the reference's UI workload)
    feasible.
    """
    import math

    if not adaptive:
        pos = init_positions(g, seed)
        for i in range(iterations):
            new = force_atlas_step(g, pos, labels=labels, **params).localCheckpoint(eager=True)
            if i > 0:
                pos.unpersist()
            pos = new
        return pos

    state = init_positions(g, seed).select(
        "id", "x", "y",
        F.lit(0.0).alias("vx"), F.lit(0.0).alias("vy"),   # damped velocity
        F.lit(0.0).alias("pvx"), F.lit(0.0).alias("pvy"),  # prev undamped velocity
    )
    vc = max(state.count(), 1)
    speed, speed_efficiency = 1.0, 1.0
    for i in range(iterations):
        forces = _force_messages(
            g, state.select("id", "x", "y"), labels,
            params.get("gravity", 0.05), params.get("repulsion", 1.0),
            params.get("attraction", 0.2), params.get("weight_influence", 1.0),
            params.get("radius", 40.0),
        )
        cur = state.join(forces, "id", "left").select(
            "id", "x", "y", "pvx", "pvy",
            (F.col("vx") + F.coalesce(F.col("fx"), F.lit(0.0))).alias("nvx"),
            (F.col("vy") + F.coalesce(F.col("fy"), F.lit(0.0))).alias("nvy"),
        )
        cur = cur.localCheckpoint(eager=True)
        swg_v = F.sqrt((F.col("pvx") - F.col("nvx")) ** 2 + (F.col("pvy") - F.col("nvy")) ** 2)
        tra_v = F.sqrt((F.col("pvx") + F.col("nvx")) ** 2 + (F.col("pvy") + F.col("nvy")) ** 2) * 0.5
        agg = cur.agg(F.sum(swg_v).alias("s"), F.sum(tra_v).alias("t")).collect()[0]
        swinging = float(agg["s"] or 0.0) + 1e-12
        traction = float(agg["t"] or 0.0) + 1e-12
        # reference tuning loop (force_atlas.clj:104-119)
        chaos_threshold = jitter_tolerance * min(
            10.0, 0.05 * math.sqrt(vc) * traction / (vc * vc)
        )
        if swinging / traction > 2.0:
            if speed_efficiency > 0.05:
                speed_efficiency *= 0.5
            chaos_threshold = max(chaos_threshold, jitter_tolerance)
        target_speed = chaos_threshold * speed_efficiency * traction / swinging
        if swinging > chaos_threshold * traction:
            if speed_efficiency > 0.05:
                speed_efficiency *= 0.7
        elif speed < 1000:
            speed_efficiency *= 1.3
        speed = speed + min(target_speed - speed, 0.5 * speed)
        friction = min(0.95, max(0.2, 1 - 0.05 * traction / (vc ** 1.8)))
        factor = speed / (1.0 + F.sqrt(F.lit(speed) * swg_v))
        new = cur.select(
            "id",
            (F.col("x") + F.col("nvx") * factor).alias("x"),
            (F.col("y") + F.col("nvy") * factor).alias("y"),
            (F.col("nvx") * friction).alias("vx"),
            (F.col("nvy") * friction).alias("vy"),
            F.col("nvx").alias("pvx"),
            F.col("nvy").alias("pvy"),
        )
        new = new.localCheckpoint(eager=True)
        cur.unpersist()
        if i > 0:
            state.unpersist()
        state = new
    return state.select("id", "x", "y")
