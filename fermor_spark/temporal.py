"""Temporal joins: as-of and range — the time-series primitives the
reference ecosystem lacks and a training-data/event pipeline needs
(SURVEY §2.12 beyond-reference scope; no reference counterpart).

Scale shapes:

* ``asof_join`` — union-tag + running ``last(..., ignorenulls)`` over a
  (key, time) window: ONE shuffle on the key, a sort within partitions, no
  row explosion. This is the sort-merge as-of plan; a naive formulation
  (left ⋈ right on key AND right.ts <= left.ts, then max) explodes to the
  full per-key cross product before aggregating.
* ``range_join`` — time-bin bucketing: both sides get
  ``bin = floor(epoch/width)`` with ``width >= max(before, after)``; the
  left side probes bins {-1, 0, +1}, so the join is a pure equi-join on
  (key, bin) and the exact interval predicate filters candidates after.
  Candidate volume ≈ 3 × rows-per-bin — never the all-pairs theta join
  Catalyst would otherwise plan (BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the MOST RECENT right row with
    ``right.on <= left.on`` (per ``by`` key), like pandas.merge_asof /
    DuckDB ASOF JOIN. Unmatched (or out-of-tolerance) rows keep nulls.

    ``right_cols`` selects which right payload columns to carry (default:
    all except the key/time columns); each arrives as ``<col><suffix>``,
    plus ``<on><suffix>`` = the matched right timestamp.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [on]]
    carried = [f"{c}{suffix}" for c in right_cols]

    # A left column named like an internal or suffix-derived name would be
    # silently shadowed and produce wrong results — fail loudly instead.
    reserved = {"_side", f"{on}{suffix}", *carried}
    reserved |= {f"_p_{c}" for c in carried + [f"{on}{suffix}"]}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with internal/"
            f"suffix-derived names; rename them or pick another suffix"
        )

    r = right.select(
        *keys, F.col(on).alias(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn(f"{on}{suffix}", F.col(on)).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows sort BEFORE left rows at equal timestamps (side 0 < 1), so
    # an exactly-simultaneous right row is a valid match
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy(on, "_side").rowsBetween(Window.unboundedPreceding, 0)
    picked = u.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_p_{c}")
          for c in carried + [f"{on}{suffix}"]],
    ).where(F.col("_side") == 1)

    valid = F.col(f"_p_{on}{suffix}").isNotNull()
    if tolerance_seconds is not None:
        # unix_micros keeps full microsecond precision; unix_timestamp would
        # truncate to whole seconds and admit pairs whose true gap is in
        # (tolerance, tolerance+1).
        valid = valid & (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"_p_{on}{suffix}"))
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        )
    out_cols = [c for c in left.columns]
    picked = picked.select(
        *out_cols,
        *[F.when(valid, F.col(f"_p_{c}")).alias(c)
          for c in carried + [f"{on}{suffix}"]],
    )
    return picked


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    before_seconds: int = 0,
    after_seconds: int = 0,
    suffix: str = "_right",
) -> DataFrame:
    """Inner-join left rows to every right row with ``right.on`` in
    ``[left.on - before, left.on + after]`` per ``by`` key, without a
    theta join: both sides bucket into time bins of
    ``width = max(before, after, 1)`` seconds and the left probes bins
    {-1, 0, +1} — any in-range right row is at most one bin away — then the
    exact interval predicate filters. Right columns arrive suffixed.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    suffixed = {f"{c}{suffix}" for c in right.columns if c not in keys}
    clash = ({"_bin", "_bin0", "_off"} | suffixed) & set(left.columns)
    if clash:
        raise ValueError(
            f"range_join: left columns {sorted(clash)} collide with internal/"
            f"suffix-derived names; rename them or pick another suffix"
        )

    # All bin arithmetic and the interval predicate run on unix_micros
    # (full microsecond precision) — unix_timestamp truncates to whole
    # seconds, which can wrongly include pairs whose true gap is in
    # (bound, bound+1) seconds.
    width_us = max(before_seconds, after_seconds, 1) * 1_000_000
    before_us = int(before_seconds) * 1_000_000
    after_us = int(after_seconds) * 1_000_000
    lbin = F.floor(F.unix_micros(F.col(on)) / width_us).cast("long")

    r = right.select(
        *[F.col(c).alias(c if c in keys else f"{c}{suffix}") for c in right.columns]
    ).withColumn(
        "_bin", F.floor(F.unix_micros(F.col(f"{on}{suffix}")) / width_us).cast("long")
    )
    l = left.withColumn("_bin0", lbin)
    l = l.withColumn("_off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    l = l.withColumn("_bin", F.col("_bin0") + F.col("_off")).drop("_bin0", "_off")

    joined = l.join(r, keys + ["_bin"])
    in_range = (
        (F.unix_micros(F.col(f"{on}{suffix}"))
         >= F.unix_micros(F.col(on)) - F.lit(before_us))
        & (F.unix_micros(F.col(f"{on}{suffix}"))
           <= F.unix_micros(F.col(on)) + F.lit(after_us))
    )
    return joined.where(in_range).drop("_bin")


def funnel(events: DataFrame, steps: list[str], horizon: str = "7 days",
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered funnel conversion: per user, the earliest strictly-ordered
    cascade through `steps` (each step's event must come AFTER the
    previous step's matched time and within `horizon` of the user's FIRST
    step-1 event); returns (step_index, step_name, n_users) — the users
    whose cascade reached each step. The classic product-analytics
    operator re-expressed as k-1 keyed join+min aggregations (no window
    over whole histories, no UDF), every join on the user key — a
    co-partitioned chain at scale.

    ONE left-join chain carrying (_t1.._tk) per cohort user, counted by
    a SINGLE one-row aggregate at the end (count(_ti) = users reaching
    step i) — not a union of per-step count rows: that shape evaluated
    step i's whole join-chain prefix once per step ≥ i, i.e. O(k²)
    scans of the events table where this is O(k) (one filtered,
    column-pruned scan per step type). A user who dies at step i rides
    to the end with null _t≥i — ≤ |cohort| rows of k timestamps,
    negligible against re-scanning events quadratically.

    Null timestamps: a user whose only step-1 events carry a null ts
    has no anchor time and is counted at NO step (count(_t1) skips the
    null min) — deliberate; a null anchor cannot order a cascade. (The
    pre-r13 union-of-counts shape counted such users at step 1 only.)"""
    from pyspark.sql import functions as F

    cur = (events.where(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("_t1")))
    horizon_end = F.col("_t1") + F.expr(f"INTERVAL {horizon}")
    for i, step in enumerate(steps[1:], start=2):
        ev = events.where(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_e"))
        qualifying = F.when(
            (F.col("_e") > F.col(f"_t{i - 1}")) & (F.col("_e") <= horizon_end),
            F.col("_e"))
        # null _t{i-1} (user died earlier) or no matching event => the
        # when() is null for every row => min() yields null _ti
        cur = (cur.join(ev, user_col, "left")
               .groupBy(user_col)
               .agg(*[F.min(f"_t{j}").alias(f"_t{j}") for j in range(1, i)],
                    F.min(qualifying).alias(f"_t{i}")))
    totals = cur.agg(*[F.count(f"_t{i}").alias(f"c{i}")
                       for i in range(1, len(steps) + 1)])
    rows = F.array(*[
        F.struct(F.lit(i).cast("int").alias("step_index"),
                 F.lit(step).alias("step_name"),
                 F.col(f"c{i}").cast("long").alias("n_users"))
        for i, step in enumerate(steps, start=1)])
    return totals.select(F.explode(rows).alias("s")).select(
        "s.step_index", "s.step_name", "s.n_users")


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", period: str = "week") -> DataFrame:
    """Retention-cohort matrix: users grouped by the period of their FIRST
    event (the cohort), counted in every later period they were active —
    (cohort_start, period_offset, n_users, cohort_size). Two user-keyed
    aggregations and one broadcast-scale join of per-user cohorts onto
    per-user-period activity; offsets computed from date arithmetic, no
    window over whole histories."""
    from pyspark.sql import functions as F

    cohort = (events.groupBy(user_col)
              .agg(F.date_trunc(period, F.min(ts_col)).alias("_c")))
    active = (events.select(user_col,
                            F.date_trunc(period, F.col(ts_col)).alias("_p"))
              .distinct())
    days = {"week": 7, "day": 1}.get(period)
    off = (F.datediff(F.col("_p"), F.col("_c")) / days).cast("long") \
        if days else F.months_between(F.col("_p"), F.col("_c")).cast("long")
    sizes = cohort.groupBy("_c").agg(F.count("*").alias("cohort_size"))
    return (active.join(cohort, user_col)
            .select("_c", off.alias("period_offset"), F.col(user_col))
            .groupBy("_c", "period_offset")
            .agg(F.count("*").alias("n_users"))
            .join(sizes, "_c")
            .select(F.col("_c").cast("date").alias("cohort_start"),
                    "period_offset", "n_users", "cohort_size"))
