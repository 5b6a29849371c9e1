"""Round-close bench gate: diff the current bench record against the prior
round's DRIVER record and BLOCK the close on any >2x line that has no
root-cause note in PLANS.md.

Three consecutive rounds (r6-r8) shipped closes violating the repo's own
">2x moves need a written mechanism" rule because the check was manual.
This makes it a command:

    python tools/round_close_check.py [--prev BENCH_r08.json]
                                      [--cur BENCH_DETAIL.json]

exit 0 = clean (no >2x line, or every >2x line's full query name appears
in PLANS.md); exit 1 = blocked, with the offending lines printed.

Improvements (>2x faster) are reported but never block — the rule exists
to force explanations of regressions and of too-good-to-be-true drops
alike, but only regressions gate the close (a drop's explanation is
usually the round's own commit messages).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import short_key  # noqa: E402


# Scalar keys bench.py's JSON line carries besides per-query timings. The
# r10 close parsed these six out of the tail, compared ZERO shared query
# keys and printed "clean" — the exact vacuous comparison this tool exists
# to refuse. Any tail parse must strip them before deciding it found data.
_NON_QUERY_KEYS = {"value", "sf", "n", "rc", "cpus", "sched_floor",
                   "cc", "kcore", "scc", "bf", "bfs"}


_LEGACY_CACHE: dict[str, dict] = {}


def _legacy_full_of() -> dict[str, str]:
    """old-short-key -> full-name union over every committed
    BENCH_DETAIL_r{N}.json key_map. short_key's abbreviation table grew in
    r15 (the compact line outgrew the 1950-byte capture window), so driver
    records written under the OLD rule carry old short keys; translating
    them to full names and re-shortening keeps round-over-round
    comparisons keyed consistently instead of silently shrinking the
    shared-key set. Cache keyed by REPO (tests monkeypatch it)."""
    if REPO not in _LEGACY_CACHE:
        m: dict[str, str] = {}
        origin: dict[str, str] = {}
        for p in sorted(glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json"))):
            try:
                for full, short in (json.load(open(p)).get("key_map")
                                    or {}).items():
                    # the substitution table keeps growing: if the SAME
                    # short key ever maps to DIFFERENT full names in
                    # different rounds, last-file-wins silently
                    # mistranslates older records — warn loudly (ADVICE
                    # r15 low) so the collision gets a table fix, not a
                    # corrupted shared-key comparison
                    if m.get(short, full) != full:
                        print(
                            f"round_close_check: WARNING key_map conflict "
                            f"for short key '{short}': "
                            f"'{m[short]}' ({origin[short]}) vs "
                            f"'{full}' ({os.path.basename(p)}) — older "
                            "driver records may be mistranslated",
                            file=sys.stderr)
                    m[short] = full
                    origin[short] = os.path.basename(p)
            except Exception:
                continue
        _LEGACY_CACHE[REPO] = m
    return _LEGACY_CACHE[REPO]


def _normalize(k: str) -> str:
    """Map a (possibly legacy) short key to the CURRENT short key."""
    return short_key(_legacy_full_of().get(k, k))


def load_driver_record(path: str) -> dict[str, float]:
    """Driver BENCH_r{N}.json: {'parsed': {...}} or tail-only when the line
    outgrew the capture window (r7). Returns short_key -> seconds."""
    d = json.load(open(path))
    parsed = d.get("parsed")
    if parsed and parsed.get("queries"):
        return {_normalize(k): float(v)
                for k, v in parsed["queries"].items()}
    if parsed is not None and parsed.get("detail"):
        # bench.py's 1950-byte overflow guard emits queries={} with a
        # 'detail' pointer. The live BENCH_DETAIL.json is overwritten by
        # every bench run, so prefer the per-round snapshot committed at
        # close (BENCH_DETAIL_r{N}.json); the live file is a last resort
        # that is only trustworthy in the same session that wrote it.
        candidates = []
        if d.get("n") is not None:
            candidates.append(os.path.join(
                REPO, f"BENCH_DETAIL_r{int(d['n']):02d}.json"))
        candidates.append(os.path.join(REPO, str(parsed["detail"])))
        for c in candidates:
            if os.path.exists(c):
                q = json.load(open(c)).get("queries") or {}
                if q:  # detail files key by FULL query name
                    return {short_key(k): float(v) for k, v in q.items()}
        raise ValueError(
            f"{path}: parsed.queries is empty (overflow guard) and no "
            f"detail snapshot resolves (tried {candidates}) — refusing a "
            "vacuous comparison")
    # tail fallback must accept BOTH pretty ('": 1.2') and compact ('":1.2')
    # JSON — bench.py emits compact separators, so a colon-space-only regex
    # would silently parse an empty dict and make the whole check vacuous.
    q = dict(re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', d.get("tail", "")))
    for k in _NON_QUERY_KEYS:
        q.pop(k, None)
    out = {_normalize(k): float(v) for k, v in q.items()}
    if not out:
        raise ValueError(
            f"{path}: no parseable per-query timings (parsed=null and the "
            "tail regex matched nothing) — refusing a vacuous comparison")
    return out


def load_current(path: str) -> dict[str, float]:
    """BENCH_DETAIL.json (full names, best-of values), a raw bench stdout
    line, or a driver-record wrapper passed as --cur (VERDICT r15 #5: the
    wrapper's `tail` string used to reach the float() loop and crash with
    an opaque ValueError). Returns short_key -> seconds."""
    d = json.load(open(path))
    if isinstance(d, dict) and ("parsed" in d or "tail" in d):
        return load_driver_record(path)
    queries = d.get("queries", d)
    out = {}
    for k, v in queries.items():
        if k in _NON_QUERY_KEYS or not isinstance(v, (int, float)):
            continue
        out[short_key(k)] = float(v)
    if not out:
        raise ValueError(
            f"{path}: no per-query timings found — refusing a vacuous "
            "comparison")
    return out


def driver_records() -> list[str]:
    return sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))


def prior_driver_records(cur_path: str) -> list[str]:
    """Driver records strictly older than the round being closed.

    The r9 close ran with --prev defaulting to the NEWEST BENCH_r*.json —
    which, after the driver saves the current round's record, is the
    current round itself: the tool compared r9 against r9, printed 1.00x,
    and exited clean. The regression gate was vacuous at exactly the
    moment it runs. The current round is identified by the round number
    embedded in BENCH_DETAIL.json's path-agnostic sibling records: any
    BENCH_r{N}.json whose per-query map equals the current record (same
    keys, same values to 2dp) is treated as *this* round and excluded."""
    cur = load_current(cur_path)
    cur2 = {k: round(v, 2) for k, v in cur.items()}
    out = []
    for p in driver_records():
        try:
            rec = load_driver_record(p)
        except ValueError:
            continue
        if {k: round(v, 2) for k, v in rec.items()} == cur2:
            continue  # the current round's own record — never a baseline
        out.append(p)
    return out


def _floor_series(path):
    """The record's scheduler-floor probe series: `sched_floors`
    (start/mid/end, r15+) or the single `sched_floor` (pre-r15), from the
    detail/parsed body or the raw tail line."""
    d = json.load(open(path))
    for src in (d, d.get("parsed") or {}):
        if isinstance(src, dict) and src.get("sched_floors"):
            return [float(x) for x in src["sched_floors"]]
        if isinstance(src, dict) and "sched_floor" in src:
            return [float(src["sched_floor"])]
    tail = d.get("tail", "") if "tail" in d else ""
    m = re.search(r'"sched_floors":\[([0-9.,]+)\]', tail)
    if m:
        return [float(x) for x in m.group(1).split(",")]
    m = re.search(r'"sched_floor":\s*([0-9.]+)', tail)
    return [float(m.group(1))] if m else None


def _disk_series(path):
    """The record's disk-throughput probe series `disk_mbps` (96 MB
    write+fsync to the bench tempdir fs at start/mid/end, r16+) — the
    IO-side twin of the scheduler floor: sched probes are structurally
    blind to write-bound lines (VERDICT r15 #1, pipeline_crawl_e2e rose
    4 records straight while sched floors FELL)."""
    d = json.load(open(path))
    for src in (d, d.get("parsed") or {}):
        if isinstance(src, dict) and src.get("disk_mbps"):
            return [float(x) for x in src["disk_mbps"]]
    tail = d.get("tail", "") if "tail" in d else ""
    m = re.search(r'"disk_mbps":\[([0-9.,]+)\]', tail)
    return [float(x) for x in m.group(1).split(",")] if m else None


def _eff(series):
    s = sorted(series)
    return s[len(s) // 2]  # median


def main() -> int:
    args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
    cur_path = args.get("--cur") or os.path.join(REPO, "BENCH_DETAIL.json")
    if not os.path.exists(cur_path):
        print(f"round_close_check: missing current record ({cur_path})")
        return 1
    priors = prior_driver_records(cur_path)
    prev_path = args.get("--prev") or (priors[-1] if priors else None)
    if not prev_path:
        print("round_close_check: no prior-round driver record to compare "
              "against — cannot certify the close")
        return 1
    prev, cur = load_driver_record(prev_path), load_current(cur_path)
    plans = open(os.path.join(REPO, "PLANS.md")).read()

    # invert short->full for the PLANS.md lookup (either name counts)
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    full_of = {v: k for k, v in detail.get("key_map", {}).items()}

    regressions, improvements, blocked = [], [], []
    for k, v in sorted(cur.items()):
        p = prev.get(k)
        if not p:
            continue
        if v > 2 * p:
            regressions.append((k, p, v))
            full = full_of.get(k, k)
            if full not in plans and k not in plans:
                blocked.append((k, p, v))
        elif p > 2 * v:
            improvements.append((k, p, v))

    shared = set(prev) & set(cur)
    if not shared:
        print(f"round_close_check: {os.path.basename(prev_path)} and "
              f"{os.path.basename(cur_path)} share ZERO per-query keys — "
              "vacuous comparison, refusing to certify the close")
        return 1
    shared_prev = sum(p for k, p in prev.items() if k in cur)
    shared_cur = sum(v for k, v in cur.items() if k in prev)
    print(f"prev={os.path.basename(prev_path)} cur={os.path.basename(cur_path)}")
    print(f"shared-key totals: {shared_prev:.1f}s -> {shared_cur:.1f}s "
          f"({shared_cur / max(shared_prev, 1e-9):.2f}x)")

    # scheduler-floor normalization (r11; series since r15): records carry
    # bench.py's fixed 24-round barrier probe — start-only through r14,
    # start/mid/end from r15 (VERDICT r14 #2: the r14 close proved start
    # probes get invalidated by mid-run steal). A shared-key shift that
    # tracks the floor ratio is environment, not plan decay; a record
    # whose OWN probes spread >1.5x is a contended epoch and its per-line
    # reads carry that caveat mechanically.
    sp, sc = _floor_series(prev_path), _floor_series(cur_path)
    fp = _eff(sp) if sp else None
    fc = _eff(sc) if sc else None
    for label, series in (("prev", sp), ("cur", sc)):
        if series and len(series) > 1 and max(series) > 1.5 * min(series):
            print(f"  CONTENDED-EPOCH {label}: floor probes "
                  f"{[round(x, 2) for x in series]} spread "
                  f"{max(series) / min(series):.2f}x within the run — treat "
                  "this record's per-line reads as environment-dominated")
    if fp and fc:
        fmt = (lambda s: "/".join(f"{x:.1f}" for x in s))
        print(f"sched_floor (median of probes): {fp:.2f}s -> {fc:.2f}s "
              f"({fc / fp:.2f}x; series {fmt(sp)} -> {fmt(sc)}) — compare "
              "line moves against this before calling them plan changes")
        norm = (shared_cur / max(shared_prev, 1e-9)) / (fc / fp)
        print(f"floor-normalized shared-key ratio: {norm:.2f}x "
              "(raw ratio / floor ratio)")

    # disk-throughput twin (r16): write-bound lines (pipeline_crawl_e2e,
    # es_file_sink, the sink round-trips) move with MB/s, not with the
    # scheduler floor — read them against this series before calling a
    # plan regression. Spread >1.5x within a run = CONTENDED-IO epoch.
    dp, dc = _disk_series(prev_path), _disk_series(cur_path)
    for label, series in (("prev", dp), ("cur", dc)):
        if series and len(series) > 1 and max(series) > 1.5 * min(series):
            print(f"  CONTENDED-IO {label}: disk probes "
                  f"{[round(x) for x in series]} MB/s spread "
                  f"{max(series) / min(series):.2f}x within the run — treat "
                  "this record's write-bound lines as IO-dominated")
    if dp and dc:
        fmt_i = (lambda s: "/".join(f"{x:.0f}" for x in s))
        print(f"disk_mbps (median of probes): {_eff(dp):.0f} -> "
              f"{_eff(dc):.0f} MB/s ({_eff(dc) / _eff(dp):.2f}x; series "
              f"{fmt_i(dp)} -> {fmt_i(dc)}) — normalize write-bound lines "
              "against this, not sched_floor")
    elif dc:
        print(f"disk_mbps (cur only, no prev series): "
              f"{[round(x) for x in dc]} MB/s — baseline for future "
              "write-bound adjudications")
    for k, p, v in regressions:
        note = "(explained in PLANS.md)" if (k, p, v) not in blocked else \
            "** NO PLANS.md ROOT CAUSE — BLOCKS CLOSE **"
        print(f"  REGRESSION {k}: {p:.2f} -> {v:.2f}  {note}")
    for k, p, v in improvements:
        print(f"  improved   {k}: {p:.2f} -> {v:.2f}")

    # non-blocking WATCH list: a >1.25x regression in BOTH of the last two
    # record-to-record steps. The r8->r9 streaming creep (es_tumbling
    # 1.47->2.03, es_file_sink 1.94->2.42) sailed under the 2x gate; two
    # compounding 1.3x steps are a 1.7x nobody explained. Printing the
    # repeat offenders makes the creep class visible at the close.
    prevprev_path = priors[-2] if len(priors) >= 2 and not args.get("--prev") \
        else None
    if prevprev_path:
        try:
            prevprev = load_driver_record(prevprev_path)
        except ValueError:
            prevprev = {}
        for k, v in sorted(cur.items()):
            p, pp = prev.get(k), prevprev.get(k)
            if p and pp and v > 1.25 * p and p > 1.25 * pp:
                print(f"  WATCH      {k}: {pp:.2f} -> {p:.2f} -> {v:.2f}  "
                      "(>1.25x in two consecutive records — explain before "
                      "it compounds)")
    if blocked:
        print(f"\nBLOCKED: {len(blocked)} >2x regression(s) lack a PLANS.md "
              "root cause. Write the mechanism, then rerun.")
        return 1
    print("\nclean: no unexplained >2x regression.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
