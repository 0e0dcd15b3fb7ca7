"""Per-key diff of two bench artifacts — the round-over-round regression
check the verdicts run by hand (judge-diffed r6→r7, r7→r8): flag every
key whose timing moved more than a threshold, so structural regressions
can't hide inside a flat total.

Usage:
    python tools/bench_diff.py NEW.json [OLD.json] [--ratio 1.5] [--floor 0.3]

OLD defaults to the committed BENCH_local_sf0.1.json at HEAD (so running
against the working-tree artifact diffs the current round against the
last committed one). Keys faster than ``--floor`` seconds in BOTH
artifacts are ignored — sub-floor readings are JVM noise, not plans.
Exit code 1 if any regression is found (wire into round rituals).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _load_head(rel: str) -> dict:
    out = subprocess.check_output(["git", "-C", REPO, "show", f"HEAD:{rel}"])
    return json.loads(out)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    ratio, floor = 1.5, 0.3
    if "--ratio" in args:
        i = args.index("--ratio")
        ratio = float(args[i + 1])
        del args[i : i + 2]
    if "--floor" in args:
        i = args.index("--floor")
        floor = float(args[i + 1])
        del args[i : i + 2]
    if not args:
        print(__doc__)
        return 2
    new = _load(args[0])
    old = (
        _load(args[1])
        if len(args) > 1
        else _load_head("BENCH_local_sf0.1.json")
    )
    oq, nq = old["queries"], new["queries"]
    print(
        f"old total {old['value']}s  new total {new['value']}s  "
        f"keys {len(nq)}  new errors {new.get('errors')}"
    )
    missing = sorted(set(oq) ^ set(nq))
    if missing:
        print(f"key-set drift ({len(missing)}): {missing[:10]}")
    regressions = []
    for k in sorted(nq):
        o, n = oq.get(k), nq.get(k)
        # a zero/absent old reading is sub-floor noise, not a baseline —
        # guard it explicitly or n / o divides by zero (round-8 ADVICE)
        if o is None or n is None or o <= 0 or (o < floor and n < floor):
            continue
        if n / o > ratio:
            regressions.append((n / o, k, o, n))
    for r, k, o, n in sorted(regressions, reverse=True):
        print(f"  {k:36s} {o:8.3f} -> {n:8.3f}  ({r:4.2f}x)")
    print(f"{len(regressions)} regression(s) > {ratio}x (floor {floor}s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
