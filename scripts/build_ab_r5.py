#!/usr/bin/env python
"""r5 build-path A/B: attribute the BENCH_r04 build-throughput drop.

BENCH_r04 recorded sf-build 539 docs/s and corpus-build 475 docs/s vs
r3's 913/801, while the r4 quiet-window builder artifact claimed 966 —
VERDICT r4 #3 demands the CLAUDE.md alternating protocol on the build
phase: A = current HEAD, B = the r3 end-of-round code (4d57f0b) checked
out into a git worktree, interleaved A,B,B,A back-to-back on the same
inputs (full bench.py run each; build numbers read from its JSON line),
load sampled before every leg.

Usage:  python scripts/build_ab_r5.py          (writes BENCH/build_ab_r5.json)
NEVER run concurrently with any other Spark work.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
R3_COMMIT = "4d57f0b"
WORKTREE = os.path.join(REPO, ".build", "r3_ab_worktree")
OUT = os.path.join(REPO, "BENCH", "build_ab_r5.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_worktree() -> None:
    if os.path.isdir(os.path.join(WORKTREE, "bench.py")):
        return
    if not os.path.isdir(WORKTREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", WORKTREE, R3_COMMIT],
            cwd=REPO, check=True,
        )


def _load() -> float:
    return os.getloadavg()[0]


def _run_leg(leg: str, cwd: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR)
    load0 = _load()
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    wall = time.time() - t0
    line = next(
        (ln for ln in p.stdout.splitlines() if ln.startswith('{"metric"')),
        None,
    )
    if p.returncode != 0 or line is None:
        return {"leg": leg, "error": p.stderr[-2000:], "load_before": load0}
    d = json.loads(line)
    return {
        "leg": leg,
        "load_before": round(load0, 2),
        "load_after": round(_load(), 2),
        "wall_sec": round(wall, 1),
        "sf_build_sec": d["sf_build_sec"],
        "sf_build_docs_per_sec": d["sf_build_docs_per_sec"],
        "corpus_build_sec": d["corpus_build_sec"],
        "corpus_build_docs_per_sec": d["corpus_build_docs_per_sec"],
        "query_total_sec": d["value"],
        "query_p50_sec": d["query_p50_sec"],
    }


def main() -> None:
    _ensure_worktree()
    runs = []
    # ABBA ordering cancels linear load drift
    for leg, cwd in (
        ("A1", REPO), ("B1", WORKTREE), ("B2", WORKTREE), ("A2", REPO),
    ):
        print(f"== leg {leg} ({cwd}) load={_load():.2f}", flush=True)
        runs.append(_run_leg(leg, cwd))
        print(json.dumps(runs[-1]), flush=True)

    def best(prefix: str, key: str) -> float | None:
        vals = [
            r[key] for r in runs
            if r["leg"].startswith(prefix) and key in r
        ]
        return max(vals) if vals else None

    out = {
        "purpose": (
            "r5 attribution of the BENCH_r04 build-throughput drop "
            "(539 vs r3 913 sf docs/s): is it code or window load?"
        ),
        "protocol": (
            "A=current HEAD, B=r3 end-of-round code (4d57f0b) in a git "
            "worktree; interleaved A1,B1,B2,A2 full bench.py runs "
            "back-to-back on the same sf0.1 input, local[32]; best leg "
            "per side compared (host best-of-N convention)"
        ),
        "runs": runs,
        "best_A_sf_docs_per_sec": best("A", "sf_build_docs_per_sec"),
        "best_B_sf_docs_per_sec": best("B", "sf_build_docs_per_sec"),
        "best_A_corpus_docs_per_sec": best("A", "corpus_build_docs_per_sec"),
        "best_B_corpus_docs_per_sec": best("B", "corpus_build_docs_per_sec"),
    }
    a, b = out["best_A_sf_docs_per_sec"], out["best_B_sf_docs_per_sec"]
    ac, bc = out["best_A_corpus_docs_per_sec"], out["best_B_corpus_docs_per_sec"]
    if a and b:
        out["sf_ratio_A_over_B"] = round(a / b, 3)
    if ac and bc:
        out["corpus_ratio_A_over_B"] = round(ac / bc, 3)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}, indent=1))


if __name__ == "__main__":
    main()
