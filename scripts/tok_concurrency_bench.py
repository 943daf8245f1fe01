#!/usr/bin/env python
"""A/B microbench: tokenize_window_ascii throughput at 1 vs K concurrent
processes on the representative corpus. Measures the shared-memory-system
degradation that caps the invert phase's 2->8-core scaling (CLAUDE.md).

Each worker process repeatedly tokenizes the same ~10k-doc window
(fresh arrays every call, matching the real mapInPandas shape) and
reports tokens/sec; the parent prints per-process mean rate at each
concurrency level plus the degradation ratio.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(texts, reps, q):
    from lucene_spark.analysis.fastpath import tokenize_window_ascii

    # warmup (page-fault / allocator steady state)
    tokenize_window_ascii(texts)
    t0 = time.perf_counter()
    ntok = 0
    for _ in range(reps):
        codes, uniq, dls = tokenize_window_ascii(texts)
        ntok += len(codes)
    q.put(ntok / (time.perf_counter() - t0))


def run_level(texts, reps, nproc):
    q = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(texts, reps, q))
        for _ in range(nproc)
    ]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / len(rates)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10000)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--high", type=int, default=8)
    args = ap.parse_args()

    from lucene_spark.corpus import make_doc
    from lucene_spark.index.builder import _OVERLONG_RE

    texts = [make_doc(i)["content"] for i in range(args.docs)]
    texts = [
        t for t in texts
        if t.isascii() and _OVERLONG_RE.search(t) is None
    ]
    blob_mb = sum(len(t) for t in texts) / 1e6
    # alternate levels to sample the same noise windows (CLAUDE.md A/B rule)
    r1a = run_level(texts, args.reps, 1)
    rka = run_level(texts, args.reps, args.high)
    r1b = run_level(texts, args.reps, 1)
    rkb = run_level(texts, args.reps, args.high)
    r1 = max(r1a, r1b)
    rk = max(rka, rkb)
    out = {
        "blob_mb": round(blob_mb, 1),
        "docs": len(texts),
        "rate_1proc": round(r1 / 1e6, 2),
        "rate_per_proc_at_%d" % args.high: round(rk / 1e6, 2),
        "degradation": round(r1 / rk, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
