"""Memory-bandwidth scaling probe for this sandbox VM.

The gazetteer KG pipeline is JVM string/sort churn — memory-traffic-bound,
not ALU-bound. A register-only CPU spin (scaling_bench.cpu_probe) scales
near-perfectly to 8 workers on this box, so it cannot explain sub-0.8
pipeline efficiency at 2→8 executors. This probe measures the memory
subsystem directly: N processes each stream over a private array, with a
barrier so every worker allocates/initializes BEFORE any worker's timed
section starts (without the barrier, late workers' untimed init steals
bandwidth from early workers' timed reads and the short-run numbers are
garbage — measured both ways).

Two access patterns:
  * stream — sequential int64 sum: DRAM prefetch-friendly, the best case.
  * chase  — data-dependent pointer chase over a 256 MB permutation:
    latency-bound random access, the pattern hash joins / string sorts
    actually generate.

Usage: python scripts/membw_probe.py [--mb 512] [--reps 8]
Prints one JSON line with per-level walls and 2→8 per-worker efficiency.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _worker(kind: str, mb: int, reps: int, barrier, out, idx: int) -> None:
    n = mb * 1024 * 1024 // 8
    rng = np.random.default_rng(idx)
    if kind == "stream":
        a = rng.integers(0, 255, size=(n,), dtype=np.int64)
    else:  # chase: random cyclic permutation -> data-dependent loads
        a = rng.permutation(n).astype(np.int64)
    barrier.wait()
    t0 = time.time()
    if kind == "stream":
        s = 0
        for _ in range(reps):
            s += int(a.sum())
    else:
        # vectorized pointer chase: each hop is a full random gather pass
        idxs = np.arange(0, n, 64, dtype=np.int64)
        for _ in range(reps):
            idxs = a[idxs]
    out[idx] = time.time() - t0


def _level_once(kind: str, procs: int, mb: int, reps: int) -> float:
    barrier = mp.Barrier(procs)
    out = mp.Manager().dict()
    ps = [
        mp.Process(target=_worker, args=(kind, mb, reps, barrier, out, i))
        for i in range(procs)
    ]
    for p in ps:
        p.start()
    # bounded join with ONE shared deadline: a worker OOM-killed BEFORE
    # barrier.wait() leaves the others blocked in the barrier forever —
    # per-process timeouts would stack to procs x 600 s before detection
    deadline = time.time() + 600
    for p in ps:
        p.join(timeout=max(0.0, deadline - time.time()))
    if any(p.is_alive() for p in ps):
        for p in ps:
            p.terminate()
        raise RuntimeError(f"membw probe: worker hang at procs={procs}")
    if len(out) != procs:
        # a worker died after the barrier: max(survivors) would report a
        # silently optimistic wall — fail loudly instead
        raise RuntimeError(
            f"membw probe: {procs - len(out)}/{procs} workers died "
            f"(likely OOM at mb={mb}); rerun with a smaller --mb"
        )
    return max(out.values())  # slowest worker = level wall (fixed work each)


def level(kind: str, procs: int, mb: int, reps: int, trials: int = 5) -> float:
    # min over trials: this VM's vCPU scheduling is jittery (single-worker
    # hiccups of 0.5-1 s appear at random); the minimum wall is the honest
    # capability number, the jitter affects Spark and probe alike
    return min(_level_once(kind, procs, mb, reps) for _ in range(trials))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    res = {}
    for kind in ("stream", "chase"):
        mb = args.mb if kind == "stream" else max(256, args.mb // 2)
        walls = {n: round(level(kind, n, mb, args.reps), 2) for n in (1, 2, 8)}
        res[kind] = {
            "mb_per_proc": mb,
            "wall_s": walls,
            # fixed work per worker: per-worker efficiency a→b = wall_a/wall_b
            "per_worker_eff_1to2": round(walls[1] / walls[2], 3),
            "per_worker_eff_2to8": round(walls[2] / walls[8], 3),
        }
    print(json.dumps({"probe": "membw", "reps": args.reps, **res}))


if __name__ == "__main__":
    main()
