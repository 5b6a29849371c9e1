"""Size-guarded join-side broadcast hints.

A literal ``F.broadcast(df)`` / ``df.hint("broadcast")`` BYPASSES
``spark.sql.autoBroadcastJoinThreshold``: Catalyst collects the hinted
side to the driver no matter how large it turns out to be.  That is the
right tool for frames bounded by schema or operator contract (nation =
25 rows, a 1-row aggregate scalar, a caller-documented dimension) and a
guaranteed driver/executor OOM for frames that scale with the data —
the vertex table behind ``of_kind``/``vertices(kind)``, or a round-1
k-core frontier that can contain most of the graph (the two OOM-class
sites deferred in PLANS.md "r16: operator-level forced-broadcast
audit").

Simply dropping those hints is not plan-neutral either: both sides are
checkpoint-backed ExistingRDDs with no catalog stats, so the static
planner falls back to sort-merge join and only AQE can repair it at
runtime — the exact regression the r15 recommender work measured.

``bounded_broadcast`` is the middle path: pay one cheap limit-probe
job, attach the hint only when the probe PROVES the side small, and
otherwise hand the un-hinted frame back to Catalyst/AQE.  The probe is
``df.limit(max_rows + 1).count()`` — the limit pushes into the scan, so
the job touches at most ``max_rows + 1`` rows regardless of the side's
true size, and on a persisted or checkpointed frame (both target call
sites) it is milliseconds.  On an expensive UN-persisted lineage the
probe re-runs that lineage until the limit is hit; probe persisted
frames, or pass a caller-known bound instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default proof bar: ~1M rows of the narrow (id + one small column)
# frames this repo hints is a few tens of MB serialized — inside the
# session's 64 MB autoBroadcastJoinThreshold and far below driver-heap
# danger, while still covering every realistic "small side" (a kind
# slice, a late-round shrinking frontier).
DEFAULT_MAX_ROWS = 1_000_000


def bounded_broadcast(
    df: DataFrame,
    max_rows: int = DEFAULT_MAX_ROWS,
    known_rows: int | None = None,
) -> DataFrame:
    """Return ``F.broadcast(df)`` iff ``df`` provably holds at most
    ``max_rows`` rows, else ``df`` unchanged (Catalyst + AQE pick the
    join strategy).

    ``known_rows`` skips the probe job when the caller already holds a
    row count or an upper bound for it — e.g. the k-core loop counts
    its degree table every round anyway, and any frontier it derives is
    no larger.  ``known_rows=None`` runs the limit probe.
    """
    if known_rows is None:
        known_rows = df.limit(max_rows + 1).count()
    return F.broadcast(df) if known_rows <= max_rows else df
