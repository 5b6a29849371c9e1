#!/usr/bin/env python3
"""Gate-staleness audit: union every CORRECTNESS_r*.json, report each
registered query's NEWEST green driver row and its staleness (rounds
since), plus never-gated registrations.

The coverage invariant this repo runs on (r12, risk-tiered — see the
_gate_priority block in queries.py): never-gated and changed-code rows
gate the round they land/change; every frozen parity-swept row re-gates
at least every 4 rounds, so its newest green driver row is at most 3
rounds old at any round close. The driver records only the first 50
registry rows per round; the window is computed stalest-first from the
committed CORRECTNESS records. This tool makes the invariant checkable
in seconds instead of a by-hand union.

Usage: python tools/gate_staleness.py [--max-stale N] [--repo DIR]
Exit 1 when any query exceeds --max-stale (default 3) or a registered
query has never been gated, listing the offenders — wire it into the
round-close routine next to round_close_check.py. NOTE: registrations
new in the CURRENT round legitimately report never-gated until the
driver's record for the round lands.
"""

import argparse
import glob
import json
import os
import re
import sys


def load_rounds(repo: str):
    rounds = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rn = int(m.group(1))
        try:
            rounds[rn] = json.load(open(path))
        except (OSError, json.JSONDecodeError) as e:
            print(f"warn: skipping {path}: {e}", file=sys.stderr)
    return rounds


def green(entry: dict) -> bool:
    return (entry.get("err") is None and entry.get("rows_match")
            and entry.get("schema_match")
            # hash_match is null for rows-only (no-oracle) checks;
            # only an explicit False is a failure
            and entry.get("hash_match") is not False)


def registry_names(repo: str):
    sys.path.insert(0, repo)
    from fermor_spark.queries import all_queries
    return list(all_queries().keys())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-stale", type=int, default=3)
    ap.add_argument("--allow-pending", action="store_true",
                    help="never-gated rows sitting inside the coming "
                         "50-row window count as PENDING, not failures "
                         "— the close-time mode (the driver gates them "
                         "when it runs this round's window)")
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    rounds = load_rounds(args.repo)
    if not rounds:
        print("no CORRECTNESS_r*.json records found")
        return 1
    latest_round = max(rounds)
    newest_green: dict = {}
    red_latest: dict = {}
    for rn in sorted(rounds):
        for name, entry in rounds[rn].items():
            if green(entry):
                newest_green[name] = rn
                red_latest.pop(name, None)
            elif rn == latest_round:
                red_latest[name] = entry.get("err") or "value mismatch"

    names = registry_names(args.repo)
    window = set(names[:50])
    never, pending, stale, fresh = [], [], [], []
    for name in names:
        if name not in newest_green:
            if args.allow_pending and name in window:
                pending.append(name)
            else:
                never.append(name)
            continue
        st = latest_round - newest_green[name]
        (stale if st > args.max_stale else fresh).append(
            (st, newest_green[name], name))

    print(f"registry: {len(names)} queries | driver records: "
          f"r{min(rounds)}..r{latest_round} | fresh (<= {args.max_stale} "
          f"rounds): {len(fresh)} | stale: {len(stale)} | never gated: "
          f"{len(never)} | pending in window: {len(pending)}")
    for st, rn, name in sorted(stale, reverse=True):
        print(f"  STALE {st} (last green r{rn}): {name}")
    for name in never:
        print(f"  NEVER GATED: {name}")
    for name in pending:
        print(f"  PENDING (heads the coming window): {name}")
    if red_latest:
        print(f"  RED in r{latest_round}:")
        for name, why in sorted(red_latest.items()):
            print(f"    {name}: {why}")
    if stale or never or red_latest:
        return 1
    print("clean: every registered query has a green driver row within "
          f"{args.max_stale} rounds.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
