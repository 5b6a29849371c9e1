"""Pin tools/round_close_check's record-resolution contract (VERDICT r10
#2: the r10 close compared ZERO shared per-query keys and printed
"clean"). These tests make the fix durable: the loader must resolve the
overflow-guard detail pointer to the committed per-round snapshot, strip
scalar keys from the tail parse, and REFUSE vacuous comparisons."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from round_close_check import load_driver_record  # noqa: E402


def _write(path, obj):
    with open(path, "w") as fh:
        json.dump(obj, fh)
    return str(path)


def test_parsed_queries_path(tmp_path):
    p = _write(tmp_path / "BENCH_r97.json",
               {"n": 97, "parsed": {"queries": {"q1": 1.5, "dd_x": 0.2}}})
    assert load_driver_record(p) == {"q1": 1.5, "dd_x": 0.2}


def test_overflow_guard_resolves_committed_snapshot(tmp_path, monkeypatch):
    import round_close_check as rcc

    monkeypatch.setattr(rcc, "REPO", str(tmp_path))
    _write(tmp_path / "BENCH_DETAIL_r98.json",
           {"queries": {"q1_pricing_summary": 2.0}})
    p = _write(tmp_path / "BENCH_r98.json",
               {"n": 98, "parsed": {"queries": {},
                                    "detail": "BENCH_DETAIL.json"}})
    assert load_driver_record(p) == {"q1": 2.0}   # short_key applied


def test_overflow_guard_without_snapshot_refuses(tmp_path, monkeypatch):
    import round_close_check as rcc

    monkeypatch.setattr(rcc, "REPO", str(tmp_path))
    p = _write(tmp_path / "BENCH_r99.json",
               {"n": 99, "parsed": {"queries": {},
                                    "detail": "BENCH_DETAIL.json"}})
    with pytest.raises(ValueError, match="vacuous"):
        load_driver_record(p)


def test_tail_parse_strips_scalar_keys(tmp_path):
    tail = ('{"metric":"x","value":83.15,"queries":{"q1":1.25},"sf":0.1,'
            '"rounds":{"cc":3,"kcore":23,"scc":2,"bf":3,"bfs":0},'
            '"sched_floor":9.19}')
    p = _write(tmp_path / "BENCH_r96.json", {"n": 96, "tail": tail})
    assert load_driver_record(p) == {"q1": 1.25}


def test_tail_parse_only_scalars_refuses(tmp_path):
    # exactly the r10 failure: six junk scalar keys parse, zero queries
    tail = ('"value":83.15,"sf":0.1,"cc":3,"kcore":23,"scc":2,"bf":3,'
            '"bfs":0,"sched_floor":9.1')
    p = _write(tmp_path / "BENCH_r95.json", {"n": 95, "tail": tail})
    with pytest.raises(ValueError, match="vacuous"):
        load_driver_record(p)


def test_zero_shared_keys_blocks_close(tmp_path):
    prev = _write(tmp_path / "BENCH_r94.json",
                  {"n": 94, "parsed": {"queries": {"q1": 1.0}}})
    cur = _write(tmp_path / "cur.json", {"queries": {"zz_other": 1.0}})
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "round_close_check.py"),
         "--prev", prev, "--cur", cur],
        capture_output=True, text=True)
    assert r.returncode == 1
    assert "ZERO per-query keys" in r.stdout
