"""Hardware-ceiling microbenchmark — NO Ray involved.

Measures how the pure signature kernel (shingle-hash + minhash + simhash +
bottom-k sketch over Arrow batches — the pipeline's bandwidth-bound inner
loop) scales when run in N completely independent OS processes on this box.
Any shortfall from linear here is a property of the MACHINE (shared memory
bandwidth / LLC / turbo), not of the distribution strategy: a real N->4N
NODE scale-up multiplies bandwidth along with cores, so this number is the
per-node ceiling against which single-box CPU-scaling efficiency must be
read (BENCH/BASELINE.md protocol).

Usage: python scripts/kernel_ceiling.py [levels...]   (default: 1 2 8 32)
Prints one JSON line: per-level aggregate docs/s + pairwise efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_DOCS = 1024
SECONDS = 6.0


def _worker(seed: int, out_q) -> None:
    import pyarrow as pa

    from dynaalign_ray.config import DedupConfig
    from dynaalign_ray.fixtures import generate_pages
    from dynaalign_ray.extract import extract_text_batch
    from dynaalign_ray.stages.minhash import minhash_batch

    cfg = DedupConfig()
    pages, _ = generate_pages(BATCH_DOCS, seed=seed)
    docs = extract_text_batch(pages)
    # warm (first-touch page faults, permutation cache)
    minhash_batch(docs, cfg=cfg)
    n_batches = 0
    t0 = time.time()
    while time.time() - t0 < SECONDS:
        minhash_batch(docs, cfg=cfg)
        n_batches += 1
    dt = time.time() - t0
    out_q.put(n_batches * BATCH_DOCS / dt)


def measure(n_procs: int) -> float:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(42 + i, q)) for i in range(n_procs)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> int:
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 8, 32]
    out: dict = {"metric": "kernel_ceiling", "batch_docs": BATCH_DOCS}
    rates: dict[int, float] = {}
    for n in levels:
        rates[n] = measure(n)
        out[f"docs_per_sec_{n}"] = round(rates[n], 1)
    for lo, hi in zip(levels, levels[1:]):
        out[f"eff_{lo}to{hi}"] = round((rates[hi] / rates[lo]) / (hi / lo), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
