#!/usr/bin/env python
"""A/B the delta-trick window-attention backward (VERDICT r4 item 5 —
the flash-style structural attempt) on the dual Swin-B joint train step.

The delta kernel precomputes the softmax-jacobian row sums outside the
kernel (Σ_k dp·p = dout·out), deleting the score-sized dp*p VMEM
temporary — the round-3 G=32 transposed backward OOMed scoped vmem by
only 900 KB, so the freed temp may admit the doubled window block.

    python benchmarks/ab_swin_bwd_delta.py --delta 1 --delta_g 32
    python benchmarks/ab_swin_bwd_delta.py --delta 0          # baseline

Chained-fori-loop device timing (per-call timings through the tunnel
lie — CLAUDE.md); one config per process (fresh backend, exclusive
tunnel).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--delta", default=1, type=int)
    ap.add_argument("--delta_g", default=32, type=int)
    ap.add_argument("--batch", default=32, type=int)
    ap.add_argument("--iters", default=10, type=int)
    args = ap.parse_args()

    from gdl_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()
    import jax
    import jax.numpy as jnp

    import gdl_tpu.ops.window_attention as wa_mod

    wa_mod.BWD_DELTA = bool(args.delta)
    wa_mod.BWD_DELTA_G = args.delta_g

    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierSwin
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.joint import make_joint_train_step
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", fusion_method="concat", backbone="swin",
                 alpha=1.0, batch_size=args.batch,
                 compute_dtype="bfloat16", modulation="Normal",
                 log_grad_csv=False, fps=1)
    model = AVClassifierSwin(config=cfg, dtype=jnp.bfloat16)
    opt = make_optimizer(cfg, 100, clip_norm=None)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt,
                               spec_shape=(224, 224), frames=1)
    r = jax.random.PRNGKey(1)
    batch = {"audio": jax.random.normal(r, (args.batch, 224, 224, 1)),
             "visual": jax.random.normal(r, (args.batch, 1, 224, 224, 3)),
             "label": jnp.zeros((args.batch,), jnp.int32)}
    raw_step = make_joint_train_step(model, cfg, opt, 100)

    @jax.jit
    def many(st):
        def body(_, x):
            x2, _ = raw_step(x, batch)
            return x2

        return jax.lax.fori_loop(0, args.iters, body, st)

    fin = many(state)
    float(jax.tree.leaves(fin.params)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fin = many(state)
        float(jax.tree.leaves(fin.params)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    dt = best / args.iters
    print(f"delta={args.delta} delta_g={args.delta_g} batch={args.batch}: "
          f"{dt * 1e3:.2f} ms/step, {args.batch / dt:.1f} clips/s")


if __name__ == "__main__":
    main()
