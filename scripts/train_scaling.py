"""Two-parallelism scaling evidence for the TRAINING loop (M9) — the same
N vs 4N single-core-executor-JVM method as scripts/scaling_bench.py, over
scripts/train_job.py. Per-epoch walls (min over epochs: epoch 1 pays
broadcast/codepath warmup) give sentences/sec at each level and
efficiency = (thr_4N / thr_N) / 4.

Usage: python scripts/train_scaling.py [--cores 2 8] [--n-sentences 8192]
           [--batch-norm]

`--batch-norm` measures the sync-BN trainer instead of the plain model
(BatchNorm sites at ff/encoder/out; 2k+1 step-pruned reduction jobs per
Adam step at k sites vs 1 plain) — the mode behind BENCH.md's sync-BN
scaling rows. Throughputs are NOT comparable across modes: BN steps do
more work and more jobs per step.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import (  # noqa: E402
    REPO, WORK, base_submit_cmd, make_zip, parse_metrics_line,
)


def run_level(n_exec: int, zpath: str, args) -> dict:
    # shared scaffolding (incl. the load-bearing BLAS pinning) lives in
    # scaling_bench.base_submit_cmd — one copy for both harnesses
    cmd = base_submit_cmd(n_exec) + [
        "--py-files", zpath,
        os.path.join(REPO, "scripts/train_job.py"),
        "--n-sentences", str(args.n_sentences),
        "--batch", str(args.batch),
        "--epochs", str(args.epochs),
        "--n-shards", str(n_exec),
    ] + (["--batch-norm"] if args.batch_norm else [])
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
    return parse_metrics_line(
        proc, '"train_sentences_per_sec"', f"{n_exec} executors"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs=2, default=[2, 8])
    ap.add_argument("--n-sentences", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument(
        "--batch-norm", action="store_true",
        help="measure the sync-BN trainer (extra per-site stat/backward "
        "reductions per step) instead of the plain model",
    )
    args = ap.parse_args()

    zpath = make_zip()
    lo, hi = args.cores
    r_lo = run_level(lo, zpath, args)
    r_hi = run_level(hi, zpath, args)
    factor = hi / lo
    eff = (r_hi["train_sentences_per_sec"] / r_lo["train_sentences_per_sec"]) / factor
    print(
        json.dumps(
            {
                "levels": [r_lo, r_hi],
                "scaling_efficiency": round(eff, 3),
                "factor": factor,
                "target": 0.8,
                "pass": eff >= 0.8,
                "batch_norm": bool(args.batch_norm),
            }
        )
    )


if __name__ == "__main__":
    main()
