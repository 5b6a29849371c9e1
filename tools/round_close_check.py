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


def load_driver_record(path: str) -> dict[str, float]:
    """Driver BENCH_r{N}.json: {'parsed': {...}} or tail-only when the line
    outgrew the capture window (r7). Returns short_key -> seconds."""
    d = json.load(open(path))
    parsed = d.get("parsed")
    if parsed and parsed.get("queries"):
        return {k: float(v) for k, v in parsed["queries"].items()}
    q = dict(re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', d.get("tail", "")))
    q.pop("sf", None)
    return {short_key(k): float(v) for k, v in q.items()}


def load_current(path: str) -> dict[str, float]:
    """BENCH_DETAIL.json (full names, best-of values) or a raw bench stdout
    line. Returns short_key -> seconds."""
    d = json.load(open(path))
    queries = d.get("queries", d)
    return {short_key(k): float(v) for k, v in queries.items()}


def latest_driver_record() -> str | None:
    recs = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    return recs[-1] if recs else None


def main() -> int:
    args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
    prev_path = args.get("--prev") or latest_driver_record()
    cur_path = args.get("--cur") or os.path.join(REPO, "BENCH_DETAIL.json")
    if not prev_path or not os.path.exists(cur_path):
        print("round_close_check: missing record "
              f"(prev={prev_path}, cur={cur_path})")
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

    shared_prev = sum(p for k, p in prev.items() if k in cur)
    shared_cur = sum(v for k, v in cur.items() if k in prev)
    print(f"prev={os.path.basename(prev_path)} cur={os.path.basename(cur_path)}")
    print(f"shared-key totals: {shared_prev:.1f}s -> {shared_cur:.1f}s "
          f"({shared_cur / max(shared_prev, 1e-9):.2f}x)")
    for k, p, v in regressions:
        note = "(explained in PLANS.md)" if (k, p, v) not in blocked else \
            "** NO PLANS.md ROOT CAUSE — BLOCKS CLOSE **"
        print(f"  REGRESSION {k}: {p:.2f} -> {v:.2f}  {note}")
    for k, p, v in improvements:
        print(f"  improved   {k}: {p:.2f} -> {v:.2f}")
    if blocked:
        print(f"\nBLOCKED: {len(blocked)} >2x regression(s) lack a PLANS.md "
              "root cause. Write the mechanism, then rerun.")
        return 1
    print("\nclean: no unexplained >2x regression.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
