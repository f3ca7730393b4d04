#!/usr/bin/env python
"""Window-attention micro-benchmark at the Swin-B per-stage shapes.

Run on the real TPU (exclusive tunnel):
    python benchmarks/bench_window_attention.py

Stages (bs16 input, 224² images, window 7):
  stage1: 4096 windows, H=4,  d=32
  stage2: 1024 windows, H=8,  d=32
  stage3:  256 windows, H=16, d=32
  stage4:   64 windows, H=32, d=32
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.ops.window_attention import (
    window_attention_pallas,
    window_attention_pallas_packed,
    window_attention_xla,
    window_attention_xla_packed,
)

STAGES = [
    ("stage1", 4096, 4, 49, 32),
    ("stage2", 1024, 8, 49, 32),
    ("stage3", 256, 16, 49, 32),
    ("stage4", 64, 32, 49, 32),
]


def bench(fn, args, iters=20, warmup=2):
    """Device time per call: `iters` dependency-chained invocations inside
    ONE jit (each iteration's q depends on the previous output, so the
    device must run them sequentially; host dispatch / tunnel latency is
    excluded)."""
    q, k, v, bias, mask = args

    @jax.jit
    def many(q, k, v, bias, mask):
        def body(_, qq):
            out = fn(qq, k, v, bias, mask)
            # real (non-foldable) dependency: iteration i+1's q depends on
            # iteration i's FULL output, so nothing can be DCE'd or overlapped
            return qq + out.astype(qq.dtype) * jnp.bfloat16(1e-8)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, q)
                       .astype(jnp.float32))

    # force with a host transfer: through the remote tunnel,
    # block_until_ready can return before execution finishes
    float(many(q, k, v, bias, mask))  # compile + warm
    best = float("inf")
    for _ in range(warmup + 1):
        t0 = time.perf_counter()
        float(many(q, k, v, bias, mask))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    impls = {
        "xla": jax.jit(window_attention_xla),
        "xla_packed": jax.jit(window_attention_xla_packed),
        "pallas": window_attention_pallas,  # jitted inside
        "pallas_packed": window_attention_pallas_packed,
    }
    print(f"device: {jax.devices()[0].device_kind}")
    for name, b, h, n, d, in STAGES:
        q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)),
                               jnp.bfloat16) for _ in range(3))
        bias = jnp.asarray(rng.standard_normal((h, n, n)), jnp.bfloat16)
        nw = 64
        mask = jnp.asarray(
            np.where(rng.random((nw, n, n)) < 0.3, -100.0, 0.0),
            jnp.bfloat16) if b >= nw else None
        row = [name]
        for iname, fn in impls.items():
            try:
                ms = bench(fn, (q, k, v, bias, mask))
                row.append(f"{iname}={ms:.3f}ms")
            except Exception as e:
                row.append(f"{iname}=FAIL({type(e).__name__})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
