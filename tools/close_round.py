#!/usr/bin/env python3
"""One-command round close: chain the three close-time checks and fail
loudly if any gate blocks.

    python tools/close_round.py [--round N] [--skip-suite]

1. tools/round_close_check.py — bench regression gate vs the previous
   driver record (>2x unexplained line blocks).
2. tools/gate_staleness.py --allow-pending — coverage-rotation
   invariant (stale row or unqueued never-gated registration blocks).
3. tools/suite_state.py — full pytest core + parity sweep, recorded to
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
    args = ap.parse_args()

    checks = [
        ("round_close_check.py", []),
        ("gate_staleness.py", ["--allow-pending"]),
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
