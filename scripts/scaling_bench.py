#!/usr/bin/env python
"""Scaling-efficiency evidence: the identical index-build job at two
parallelism levels (sandbox proxy for N vs 4N executors, per BASELINE.md).

Runs scripts/build_index_job.py in fresh processes (fresh JVM each) at
local[LOW] and local[HIGH] on the same deterministic corpus, then reports
throughput at both and efficiency = (rate_high / rate_low) / (high / low).
Writes BENCH/scaling.json and prints the JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def materialize_corpus(docs: int) -> str:
    """Write the deterministic corpus to parquet once — the measured build
    job then starts from a table scan (the north-rule input shape), not
    from Python row generation."""
    path = os.path.join(REPO, ".build", f"corpus_{docs}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    sys.path.insert(0, REPO)
    from lucene_spark.corpus import corpus_spark_df
    from lucene_spark.session import get_spark

    spark = get_spark(32, app_name="corpus_materialize")
    spark.sparkContext.setLogLevel("ERROR")
    corpus_spark_df(spark, docs, partitions=32).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def run_build(cpus: int, docs: int, queries: str, corpus_path: str,
              partitions: int | None = None) -> dict:
    out_dir = os.path.join(REPO, ".build", f"scale_{cpus}")
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "build_index_job.py"),
        "--cpus", str(cpus),
        "--input", corpus_path,
        "--out", out_dir,
    ]
    if queries:
        cmd += ["--queries", queries]
    if partitions:
        cmd += ["--partitions", str(partitions)]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    res = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    if res.returncode != 0:
        sys.stderr.write(res.stdout[-2000:] + res.stderr[-4000:])
        raise SystemExit(f"build at local[{cpus}] failed")
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--docs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "20000")))
    ap.add_argument("--queries", default="query table scan,return value,spark merge batch")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--partitions", type=int, default=None,
                    help="tasks per build (waves >= 2x cores amortize "
                         "per-worker warmup and stragglers)")
    args = ap.parse_args()

    corpus_path = materialize_corpus(args.docs)
    # the sandbox shows large run-to-run variance (an external background
    # load of ~2-4 cores comes and goes; it barely touches local[2] but
    # inflates local[8] 2-4x). INTERLEAVE the levels so both sample the
    # same noise windows, and report the best of `repeat` runs per level.
    # optional quiet guard (SPARK_GRAFT_QUIET_GUARD=1): between legs, wait
    # for our own load contribution to decay, then abort if the host's
    # external background load came back — a contaminated leg poisons the
    # ratio either direction (slow low fakes GOOD efficiency), so a
    # partial run is worth discarding.
    def _guard() -> None:
        if os.environ.get("SPARK_GRAFT_QUIET_GUARD") != "1":
            return
        import time as _time

        _time.sleep(50)
        load1 = float(open("/proc/loadavg").read().split()[0])
        # own post-leg decay contributes ~0.9 after 50s from a 2-core
        # leg; 1.5 leaves room for that plus jitter while still catching
        # the 2-4-core external load.
        if load1 > 1.5:
            sys.stderr.write(f"quiet guard: load {load1} > 1.5, aborting\n")
            raise SystemExit(3)

    lo_runs, hi_runs = [], []
    for _ in range(args.repeat):
        lo_runs.append(run_build(args.low, args.docs, args.queries,
                                 corpus_path, args.partitions))
        _guard()
        hi_runs.append(run_build(args.high, args.docs, args.queries,
                                 corpus_path, args.partitions))
    lo = min(lo_runs, key=lambda d: d["build_wall_sec"])
    hi = min(hi_runs, key=lambda d: d["build_wall_sec"])
    speedup = hi["docs_per_sec"] / lo["docs_per_sec"]
    eff = speedup / (args.high / args.low)
    out = {
        "docs": args.docs,
        "low_cpus": args.low,
        "high_cpus": args.high,
        "low_docs_per_sec": round(lo["docs_per_sec"], 1),
        "high_docs_per_sec": round(hi["docs_per_sec"], 1),
        "low_wall_sec": round(lo["build_wall_sec"], 2),
        "high_wall_sec": round(hi["build_wall_sec"], 2),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "low_phases": lo.get("phases"),
        "high_phases": hi.get("phases"),
        "low_query_sec": lo.get("query_sec"),
        "high_query_sec": hi.get("query_sec"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
