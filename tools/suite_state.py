#!/usr/bin/env python3
"""Round-close suite-state record (r12; VERDICT r11 #8): run the full
pytest suite — the core set and the oracle-parity sweep separately —
parse the pass/fail counts, and write them to SUITE_STATE.json at the
repo root with the git head they describe. Round N+1's judge verifies
"suite green at close" by reading one committed JSON file instead of
rerunning ~11 minutes of Spark.

Usage:
    python tools/suite_state.py [--round N] [--skip-run]

--skip-run re-stamps the head/round onto counts already recorded this
session (refuses if SUITE_STATE.json is missing or its head mismatches
and a run is needed). Exit 1 on any failed test.

The record:
    {"round": N, "git_head": "...", "core": {"passed": P, "failed": F},
     "parity": {"passed": P, "failed": F}, "wall_s": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "SUITE_STATE.json")


def _counts(stdout: str) -> dict:
    """Parse pytest's summary line -> {'passed': N, 'failed': N}."""
    got = {"passed": 0, "failed": 0}
    tail = stdout.strip().splitlines()[-1] if stdout.strip() else ""
    hits = re.findall(r"(\d+) (passed|failed|error)", tail)
    for n, what in hits:
        key = "failed" if what in ("failed", "error") else what
        got[key] += int(n)
    if not hits:
        raise RuntimeError(f"could not parse pytest summary: {tail!r}")
    return got


def _run(args: list[str]) -> tuple[dict, float]:
    t0 = time.time()
    p = subprocess.run([sys.executable, "-m", "pytest", "-q"] + args,
                       cwd=REPO, capture_output=True, text=True)
    dt = round(time.time() - t0, 1)
    try:
        return _counts(p.stdout), dt
    except RuntimeError:
        sys.stderr.write(p.stdout[-3000:] + p.stderr[-2000:])
        raise


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="round number to stamp (default: 1 + newest "
                         "CORRECTNESS_r*.json)")
    ap.add_argument("--skip-run", action="store_true")
    args = ap.parse_args()

    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    rn = args.round
    if rn is None:
        rounds = [int(m.group(1)) for f in os.listdir(REPO)
                  if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))]
        rn = (max(rounds) + 1) if rounds else 0

    if args.skip_run:
        if not os.path.exists(OUT):
            print("no SUITE_STATE.json to re-stamp; run without --skip-run")
            return 1
        rec = json.load(open(OUT))
        if rec.get("git_head") != head:
            print(f"SUITE_STATE.json records head "
                  f"{rec.get('git_head', '?')[:12]} but HEAD is "
                  f"{head[:12]} — counts describe a different tree; "
                  "run without --skip-run")
            return 1
        rec["round"] = rn
    else:
        core, core_s = _run(["tests/", "--ignore",
                             "tests/test_oracle_parity.py"])
        parity, par_s = _run(["tests/test_oracle_parity.py"])
        rec = {"round": rn, "git_head": head, "core": core,
               "parity": parity,
               "wall_s": {"core": core_s, "parity": par_s}}
    json.dump(rec, open(OUT, "w"), indent=1)
    print(json.dumps(rec))
    return 1 if (rec["core"]["failed"] or rec["parity"]["failed"]) else 0


if __name__ == "__main__":
    sys.exit(main())
