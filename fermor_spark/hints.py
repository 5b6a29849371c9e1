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

# Bytes bar = the session's autoBroadcastJoinThreshold: a hinted frame
# the guard passes should be one Catalyst itself would have been willing
# to broadcast had it known the stats.
DEFAULT_MAX_BYTES = 64 << 20

# Static per-value width estimates for the row→bytes guard. Fixed-width
# types are exact; var-width types are deliberately generous so WIDE
# frames hit the bytes bar long before the row bar: a single nested
# column (array embedding, struct, map) caps the hintable row count at
# ~128k rows, a string column at ~1M. CALLER OBLIGATION (the reason the
# estimate can stay static and job-free): frames handed to
# bounded_broadcast must be narrow projections — join keys plus small
# scalar columns, like the ``(id, kind)`` slice or a frontier id list —
# never doc-/payload-carrying frames, whose true string width no static
# table can know. Callers with long strings must pass a smaller
# ``max_rows`` themselves.
_FIXED_WIDTHS = {
    "boolean": 1, "byte": 1, "short": 2, "integer": 4, "long": 8,
    "float": 4, "double": 8, "date": 4, "timestamp": 8,
    "timestamp_ntz": 8,
}
_VAR_WIDTH_BYTES = 64     # string / binary
_NESTED_WIDTH_BYTES = 512  # array / map / struct / anything else


def _estimated_row_bytes(df: DataFrame) -> int:
    """Schema-driven serialized-row-size estimate (no Spark job)."""
    total = 0
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t in _FIXED_WIDTHS:
            total += _FIXED_WIDTHS[t]
        elif t.startswith("decimal"):
            total += 16
        elif t in ("string", "binary", "varchar", "char"):
            total += _VAR_WIDTH_BYTES
        else:
            total += _NESTED_WIDTH_BYTES
    return max(total, 8)


def bounded_broadcast(
    df: DataFrame,
    max_rows: int = DEFAULT_MAX_ROWS,
    known_rows: int | None = None,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> DataFrame:
    """Return ``F.broadcast(df)`` iff ``df`` provably holds at most
    ``max_rows`` rows AND its schema-estimated size fits ``max_bytes``,
    else ``df`` unchanged (Catalyst + AQE pick the join strategy).

    ``known_rows`` skips the probe job when the caller already holds a
    row count or an upper bound for it — e.g. the k-core loop counts
    its degree table every round anyway, and any frontier it derives is
    no larger.  ``known_rows=None`` runs the limit probe.

    The bytes guard closes the rows-only hole (ADVICE r16): 1M rows
    passes the row bar, but 1M rows of a wide frame can far exceed the
    64 MB the row bar reasons from. The estimate is static schema
    arithmetic (``_estimated_row_bytes``) — see the caller obligation
    above it: hinted frames are narrow projections by contract, and the
    generous var-width defaults make wide schemas fail the guard rather
    than OOM the driver.
    """
    if known_rows is None:
        known_rows = df.limit(max_rows + 1).count()
    if known_rows > max_rows:
        return df
    if _estimated_row_bytes(df) * known_rows > max_bytes:
        return df
    return F.broadcast(df)
