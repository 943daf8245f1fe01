#!/usr/bin/env python
"""A/B microbench: the FULL Python-side invert kernel (tokenize +
window merge + packed-sort invert + varbyte encode + sha256) at 1 vs K
concurrent processes, outside Spark.

Each worker drives `builder._invert_partition`'s generator over pandas
batches read from distinct files of an already-materialized corpus
parquet — exactly the mapInPandas data path minus the JVM scan/write.
If this scales ~1.0 while the invert_write phase doesn't, the residual
gap is JVM-side (scan, Arrow channel, zstd run write, scheduling).
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(files, q, flush_docs):
    import pandas as pd
    import pyarrow.parquet as pq

    from lucene_spark.index import builder as B

    dfs = []
    for f in files:
        t = pq.read_table(
            f, columns=["repo", "path", "commit", "lang", "content"]
        )
        df = t.to_pandas()
        # the kernel expects rpid + the sort key columns it groups by
        df["rpid"] = 0
        dfs.append(df)
    ndocs = sum(len(d) for d in dfs)
    fn = B._invert_partition({0: 0}, store_positions=True,
                             flush_docs=flush_docs)
    # warmup on a small slice
    for _ in fn(iter([dfs[0].head(500)])):
        pass
    t0 = time.perf_counter()
    out_rows = 0
    fn = B._invert_partition({0: 0}, store_positions=True,
                             flush_docs=flush_docs)
    for frame in fn(iter(dfs)):
        out_rows += len(frame)
    dt = time.perf_counter() - t0
    q.put((ndocs / dt, out_rows))


def level(nproc, file_groups, flush_docs):
    q = mp.Queue()
    ps = [
        mp.Process(
            target=_worker,
            args=(file_groups[i % len(file_groups)], q, flush_docs),
        )
        for i in range(nproc)
    ]
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(r[0] for r in res) / len(res)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=os.path.join(REPO, ".build", "corpus_1200000.parquet"))
    ap.add_argument("--files-per-worker", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--flush-docs", type=int, default=0,
                    help="override FLUSH_DOCS (default: builder's)")
    args = ap.parse_args()

    from lucene_spark.index.builder import FLUSH_DOCS

    fd = args.flush_docs or FLUSH_DOCS
    files = sorted(glob.glob(os.path.join(args.corpus, "part-*.parquet")))
    groups = [
        files[i : i + args.files_per_worker]
        for i in range(0, len(files), args.files_per_worker)
    ]
    r1a = level(1, groups, fd)
    rka = level(args.high, groups, fd)
    r1b = level(1, groups, fd)
    rkb = level(args.high, groups, fd)
    r1, rk = max(r1a, r1b), max(rka, rkb)
    print(json.dumps({
        "flush_docs": fd,
        "docs_per_sec_1proc": round(r1, 1),
        "docs_per_sec_per_proc_at_%d" % args.high: round(rk, 1),
        "degradation": round(r1 / rk, 2),
    }))


if __name__ == "__main__":
    main()
