#!/usr/bin/env python
"""Host memory-bandwidth saturation control for the scaling narrative.

Measures aggregate achieved DRAM bandwidth (large out-of-cache numpy
copy) at 1, 2, 4, 8 concurrent processes. If aggregate bandwidth stops
growing by 2-4 processes, the host memory system is saturated and ANY
bandwidth-bound phase mathematically cannot scale with cores on this
single host — while on a real cluster every added executor brings its
own memory channels. Pairs with the pure-CPU control (22x at 32 procs,
SCALE.md) to show the job structure, not the engine, sets the ceiling.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

ARR_MB = 256
REPS = 8


def _worker(q):
    a = np.random.randint(0, 255, ARR_MB * 1024 * 1024, dtype=np.uint8)
    b = np.empty_like(a)
    np.copyto(b, a)  # warmup / fault pages
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.copyto(b, a)
    dt = time.perf_counter() - t0
    # read + write per copied byte
    q.put(2 * REPS * a.nbytes / dt / 1e9)


def level(nproc: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates)


def main():
    out = {}
    for n in (1, 2, 4, 8):
        out[f"aggregate_gbps_{n}proc"] = round(level(n), 1)
    out["saturation_ratio_8_vs_1"] = round(
        out["aggregate_gbps_8proc"] / out["aggregate_gbps_1proc"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
