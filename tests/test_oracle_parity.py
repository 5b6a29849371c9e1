"""Replicates the driver's t2 correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the same
parquet tables, then compare row count, column names, and order-insensitive
values.

Run at sf0.001 by default for speed; set PARITY_SF_DIR=/root/testdata/sf0.01
to match the driver exactly.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from fermor_spark.datasets import TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    # (tag, value): tag 0 = normal, 1 = NULL, 2 = NaN — values only compare
    # within the same tag, keeping rows sortable despite NULL/NaN
    if v is None:
        return (1, 0)
    if isinstance(v, float):
        if math.isnan(v):
            return (2, 0)
        return (0, round(v, 9))
    return (0, v)


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in idx) for r in rows
    )


from fermor_spark import queries as _qmod

# retired rows (r14 registry lever) keep full parity evidence here even
# though they left the driver-gated registry
QUERY_NAMES = sorted(set(entrymod.oracle_sql()) | set(_qmod.RETIRED_ORACLES))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = {**entrymod.queries(), **_qmod.RETIRED_QUERIES}[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(
        {**entrymod.oracle_sql(), **_qmod.RETIRED_ORACLES}[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs oracle {len(orows)}"
    sm = _rows_to_multiset(scols, srows)
    om = _rows_to_multiset(ocols, orows)
    if sm != om:
        diffs = [(a, b) for a, b in zip(sm, om) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a DataFrame."""
    oracles = entrymod.oracle_sql()
    for name, q in entrymod.queries().items():
        if name not in oracles:
            df = q(spark, SF_DIR)
            assert df.count() >= 0, name


def test_every_query_survives_empty_tables(spark, tmp_path):
    """Library hardening: every registered query must run (possibly to an
    empty result) when every input table is empty — no driver-side
    collect()[0] / shape assumptions may crash on a vacuous corpus."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet') LIMIT 0)"
            f" TO '{tmp_path}/{t}.parquet' (FORMAT PARQUET)"
        )
    failed = []
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, str(tmp_path)).limit(5).collect()
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failed.append((name, str(e).splitlines()[0][:120]))
    assert not failed, failed


def test_gate_priority_hygiene():
    """The driver gate records only the first 50 registry rows, ordered by
    _GATE_PRIORITY. Since r12 the list is COMPUTED (never-gated + changed
    rows head it, the rest stalest-first from committed CORRECTNESS
    records — see test_tools.py::test_gate_window_invariant for the cycle
    arithmetic); here we pin its structural contract: a full, duplicate-
    free permutation of the registry (a duplicate or unregistered name
    would silently shrink or waste the window), with the window as the
    registry head."""
    from fermor_spark import queries as q

    gp = q._GATE_PRIORITY
    assert len(set(gp)) == len(gp), "duplicate names in _GATE_PRIORITY"
    reg = q.all_queries()
    assert set(gp) == set(reg), "gate order must permute the registry"
    assert list(reg) == gp, "registry order must be the computed gate order"
    assert len(gp) >= 50, "registry has shrunk below the gate window"
    # changed-round names must stay registered — a rename would silently
    # drop the re-gate
    ghost = [k for k in q._CHANGED_THIS_ROUND if k not in reg]
    assert not ghost, f"_CHANGED_THIS_ROUND names not registered: {ghost}"
    # a mangled @query decorator (name line deleted by a careless edit)
    # registers the ORACLE SQL as the query name — catch that class here
    bad = [k for k in reg if " " in k or "\n" in k or len(k) > 64]
    assert not bad, f"malformed registry names: {[k[:40] for k in bad]}"
