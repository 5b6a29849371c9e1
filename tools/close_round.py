#!/usr/bin/env python3
"""One-command round close: chain the three close-time checks and fail
loudly if any gate blocks.

    python tools/close_round.py [--round N] [--skip-suite] [--skip-sweep]

1. tools/round_close_check.py — bench regression gate vs the previous
   driver record (>2x unexplained line blocks).
2. tools/gate_staleness.py --allow-pending — coverage-rotation
   invariant (stale row or unqueued never-gated registration blocks).
3. tools/empty_sweep.py x3 (empty/nulls/extreme) — the degenerate-input
   matrix over every registered∪retired query (any crash blocks; ~25
   min). In the chain since r17: the r16 close skipped it while the
   round changed four swept operators (VERDICT r16 #2 process note).
   --skip-sweep only when the three modes already ran at THIS tree.
4. tools/suite_state.py — full pytest core + parity sweep, recorded to
   SUITE_STATE.json (any failure blocks). --skip-suite re-uses counts
   already recorded this session (suite_state --skip-run).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run(name: str, args: list[str]) -> bool:
    print(f"\n=== {name} ===", flush=True)
    p = subprocess.run([sys.executable, os.path.join(HERE, name)] + args)
    ok = p.returncode == 0
    print(f"=== {name}: {'OK' if ok else 'BLOCKED'} ===", flush=True)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--skip-suite", action="store_true")
    ap.add_argument("--skip-sweep", action="store_true")
    args = ap.parse_args()

    checks = [
        ("round_close_check.py", []),
        ("gate_staleness.py", ["--allow-pending"]),
    ]
    if not args.skip_sweep:
        checks += [("empty_sweep.py", ["--mode", m])
                   for m in ("empty", "nulls", "extreme")]
    checks += [
        ("suite_state.py",
         (["--round", str(args.round)] if args.round is not None else [])
         + (["--skip-run"] if args.skip_suite else [])),
    ]
    failed = [n for n, a in checks if not run(n, a)]
    if failed:
        print(f"\nROUND CLOSE BLOCKED by: {', '.join(failed)}")
        return 1
    print("\nround close: all checks green.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
