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
import os
import sys


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

    names = registry_names(args.repo)   # also puts repo on sys.path
    from fermor_spark.gatelog import green_row, load_rounds, newest_green

    def _warn(msg):
        print(f"warn: {msg}", file=sys.stderr)

    rounds = load_rounds(args.repo, warn=_warn)
    if not rounds:
        print("no CORRECTNESS_r*.json records found")
        return 1
    latest_round = max(rounds)
    # the newest-green walk is gatelog's (ONE definition shared with the
    # computed gate window); only the latest-round red report is local
    newest, _ = newest_green(args.repo)
    red_latest = {
        name: (entry.get("err") or "value mismatch")
        for name, entry in rounds[latest_round].items()
        if not green_row(entry) and newest.get(name) != latest_round
    }
    newest_green = newest

    window = set(names[:50])
    # --allow-pending is CLOSE-TIME mode: the round being closed is
    # latest_round + 1 and its window rows will be gated by the coming
    # driver run, so (a) never-gated rows inside the window are pending,
    # not failures, and (b) staleness for rows OUTSIDE the window is
    # judged against the CLOSING round — otherwise a row at staleness
    # max_stale today closes the round one past the invariant.
    judge_round = latest_round + 1 if args.allow_pending else latest_round
    never, pending, stale, fresh = [], [], [], []
    for name in names:
        if name not in newest_green:
            if args.allow_pending and name in window:
                pending.append(name)
            else:
                never.append(name)
            continue
        if args.allow_pending and name in window:
            fresh.append((0, newest_green[name], name))   # re-gates now
            continue
        st = judge_round - newest_green[name]
        (stale if st > args.max_stale else fresh).append(
            (st, newest_green[name], name))

    print(f"registry: {len(names)} queries | driver records: "
          f"r{min(rounds)}..r{latest_round}"
          + (f" | judging close of r{judge_round}" if args.allow_pending
             else "")
          + f" | fresh (<= {args.max_stale} "
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
