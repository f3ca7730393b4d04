#!/usr/bin/env python
"""Measured torch baseline for the CREMA-D DGL step (BASELINE.md's open
item: 'reference throughput is unrecorded — measure main_dgl.py once').

No CUDA GPU exists in this image, so this measures the reference's EXACT
training-loop semantics (the torch oracle from the trajectory-parity
suite — retain_graph double backward, fusion-grad erasure, clip 40, SGD
momentum+wd, main_dgl.py:69-154) at FULL reference width (ResNet-18 dual
stems, width 64, stages 2-2-2-2) on torch-CPU. That yields a *measured*
floor to quote alongside the GPU estimate that bench.py's `vs_baseline`
is anchored to — the reference's GPUs sit somewhere between this CPU
number and the 300 clips/s engineering estimate.

    python benchmarks/torch_cpu_baseline.py [--batch 16] [--steps 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=16, type=int)
    ap.add_argument("--steps", default=2, type=int)
    args = ap.parse_args()

    import numpy as np
    import torch

    import tests.test_torch_interop as TI

    # rebuild the torch oracle at FULL reference size (the module reads
    # these globals at construction time)
    TI.WIDTH, TI.STAGES = 64, (2, 2, 2, 2)
    TI.DIM = TI.WIDTH * 8
    from tests.test_trajectory_parity import _reference_torch_loop

    model = TI.TorchAVClassifierDGL()
    n_params = sum(p.numel() for p in model.parameters())
    rng = np.random.default_rng(0)
    b = args.batch
    batches = [(rng.standard_normal((b, 1, 257, 188)).astype(np.float32),
                rng.standard_normal((b, 3, 1, 224, 224)).astype(np.float32),
                rng.integers(0, 6, b).astype(np.int64))
               for _ in range(args.steps + 1)]

    _reference_torch_loop(model, batches[:1])  # warmup
    t0 = time.perf_counter()
    _reference_torch_loop(model, batches[1:])
    dt = (time.perf_counter() - t0) / args.steps
    print(json.dumps({
        "torch_cpu_clips_per_sec": round(b / dt, 2),
        "ms_per_step": round(dt * 1e3, 1),
        "batch": b,
        "params": n_params,
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
