#!/usr/bin/env python
"""Tight build-only A/B: many short interleaved legs.

The full-bench A/B (scripts/build_ab_r5.py) has 5-9 minute legs, so by
the time side B runs, the host's background load has moved — its first
artifact showed a 4x spread WITHIN one side, swamping any A-B signal.
This runner isolates the sf-index BUILD phase into ~20-second legs and
strictly alternates A,B,A,B,... so both sides sample the same load
trajectory; best-of-N per side is then compared (host convention).

Each leg is a fresh subprocess that imports lucene_spark FROM THE LEG'S
CHECKOUT (sys.path injection), builds the sf index into a throwaway
dir, and prints one JSON line with the build seconds.

Usage: python scripts/build_only_ab.py [pairs=5] [sf_dir]
Writes BENCH/build_only_ab_r5.json. NEVER run concurrently with other
Spark work.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = "/root/repo"
WORKTREE = os.path.join(REPO, ".build", "r3_ab_worktree")
OUT = os.path.join(REPO, "BENCH", "build_only_ab_r5.json")
SCRATCH = os.path.join(REPO, ".build", "ab_scratch")

_LEG_CODE = r"""
import json, os, shutil, sys, time
side_dir, sf_dir, out_dir, cpus = sys.argv[1:5]
sys.path.insert(0, side_dir)
from lucene_spark.session import get_spark
from lucene_spark.index.builder import build_index
from pyspark.sql import functions as F
spark = get_spark(int(cpus))
spark.sparkContext.setLogLevel("ERROR")
docs = (
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    .select(
        F.col("source").alias("repo"),
        F.format_string("%012d", F.col("doc_id")).alias("path"),
        F.lit("0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
)
n = docs.count()  # warm the scan outside the timed window
shutil.rmtree(out_dir, ignore_errors=True)
t0 = time.time()
build_index(spark, docs, out_dir, store_positions=True)
dt = time.time() - t0
print(json.dumps({"build_sec": round(dt, 3), "docs": n,
                  "docs_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def _leg(side: str, side_dir: str, sf_dir: str, cpus: int) -> dict:
    out_dir = os.path.join(SCRATCH, f"idx_{side}")
    load0 = os.getloadavg()[0]
    p = subprocess.run(
        [sys.executable, "-c", _LEG_CODE, side_dir, sf_dir, out_dir, str(cpus)],
        capture_output=True, text=True, timeout=900, cwd=side_dir,
    )
    line = next(
        (ln for ln in p.stdout.splitlines() if ln.startswith("{")), None
    )
    r = {"leg": side, "load_before": round(load0, 2)}
    if p.returncode != 0 or line is None:
        r["error"] = p.stderr[-1500:]
    else:
        r.update(json.loads(line))
    return r


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if not os.path.isdir(WORKTREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", WORKTREE, "4d57f0b"],
            cwd=REPO, check=True,
        )
    runs = []
    for i in range(pairs):
        for side, d in (("A", REPO), ("B", WORKTREE)):
            r = _leg(f"{side}{i + 1}", d, sf_dir, cpus)
            runs.append(r)
            print(json.dumps(r), flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)

    def stats(prefix: str) -> dict:
        v = sorted(
            r["docs_per_sec"] for r in runs
            if r["leg"].startswith(prefix) and "docs_per_sec" in r
        )
        return {
            "best": v[-1] if v else None,
            "median": v[len(v) // 2] if v else None,
            "all": v,
        }

    out = {
        "purpose": (
            "r5 build-path attribution, tight legs: sf-index build only, "
            "strict A,B alternation (A=HEAD, B=r3 4d57f0b)"
        ),
        "sf_dir": sf_dir,
        "cpus": cpus,
        "runs": runs,
        "A": stats("A"),
        "B": stats("B"),
    }
    if out["A"]["best"] and out["B"]["best"]:
        out["ratio_best_A_over_B"] = round(out["A"]["best"] / out["B"]["best"], 3)
        out["ratio_median_A_over_B"] = round(
            out["A"]["median"] / out["B"]["median"], 3
        )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}, indent=1))


if __name__ == "__main__":
    main()
