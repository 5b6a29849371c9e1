"""Shared reader for the driver's committed CORRECTNESS_r*.json records.

ONE definition of "green driver row" and of the record walk, imported by
the three consumers that must never disagree: the computed gate window
(queries._gate_priority), the staleness checker (tools/gate_staleness.py),
and the invariant test (tests/test_tools.py). A criteria change edited in
one copy but not the others would silently de-synchronize the window from
its checkers — hence this module.
"""

from __future__ import annotations

import glob
import json
import os
import re


def green_row(entry: dict) -> bool:
    """A gate row counts as green when it has no error and every match
    flag holds; hash_match is null for rows-only (no-oracle) checks, so
    only an explicit False fails."""
    return (entry.get("err") is None and bool(entry.get("rows_match"))
            and bool(entry.get("schema_match"))
            and entry.get("hash_match") is not False)


def load_rounds(root: str, warn=None) -> dict:
    """round number -> parsed CORRECTNESS record. Files whose suffix is
    not purely digits, or that fail to parse, are skipped (never crash
    an import over a stray draft file). Checkers that must not judge
    against a silently-dropped round pass ``warn`` (a callable taking
    one message) — a corrupt LATEST record would otherwise shift every
    staleness computation one round back unnoticed."""
    rounds: dict = {}
    for path in sorted(glob.glob(os.path.join(root,
                                              "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            if warn:
                warn(f"skipping non-round record file: {path}")
            continue
        try:
            rounds[int(m.group(1))] = json.load(open(path))
        except (OSError, ValueError) as e:
            if warn:
                warn(f"skipping unreadable record {path}: {e}")
            continue
    return rounds


def newest_green(root: str, warn=None) -> tuple[dict, int]:
    """(query name -> newest round with a green row, latest round seen).
    latest is 0 on a record-free checkout."""
    rounds = load_rounds(root, warn=warn)
    newest: dict = {}
    for rn in sorted(rounds):
        for name, entry in rounds[rn].items():
            if green_row(entry):
                newest[name] = max(rn, newest.get(name, 0))
    return newest, (max(rounds) if rounds else 0)
