#!/usr/bin/env python
"""Capture a jax.profiler trace of an intermediate-family train step
(MMTM / SE-fusion / mmformer) and print the op-category breakdown via
tools/parse_xplane.py — the round-3 profiling pass VERDICT item 3 asks
for before touching the mmformer kernels.

    python benchmarks/profile_intermediate_step.py [--model mmformer_n]
           [--batch 64] [--out /tmp/mmformer_prof]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mmformer_n")
    ap.add_argument("--batch", default=64, type=int)
    ap.add_argument("--out", default="/tmp/mmformer_prof")
    ap.add_argument("--no_clip", action="store_true",
                    help="diagnostic: drop the global-norm clip from the "
                         "chain to attribute its reduce cost in profiles")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.train.auxi import make_auxi_train_step
    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.train.optim import make_optimizer
    from main_intermediate import build_model, make_sefusion_step

    cfg = Config(dataset="CREMAD", batch_size=args.batch, fps=1,
                 compute_dtype="bfloat16", log_grad_csv=False)
    model, kind = build_model(args.model, cfg.n_classes, 64,
                              dtype=jnp.bfloat16)
    opt = make_optimizer(cfg, 100,
                         clip_norm=None if args.no_clip else 40.0)
    rng = jax.random.PRNGKey(0)
    f, t = cfg.spec_shape
    variables = model.init({"params": rng, "drop": rng, "dropout": rng,
                            "pe": rng},
                           jnp.zeros((2, f, t, 1)),
                           jnp.zeros((2, 1, 224, 224, 3)),
                           train=False, av_inputs=True)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt.init(variables["params"]))
    if kind == "single":
        raw = make_sefusion_step(model, cfg, opt, rng)
    else:
        raw = make_auxi_train_step(model, cfg, opt,
                                   seven_tuple=kind == "seven",
                                   base_rng=rng, av_inputs=True)
    r = jax.random.PRNGKey(1)
    batch = {"audio": jax.random.normal(r, (args.batch, f, t, 1)),
             "visual": jax.random.normal(r, (args.batch, 1, 224, 224, 3)),
             "label": jnp.zeros((args.batch,), jnp.int32)}
    step = jax.jit(raw, donate_argnums=(0,))
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])

    with jax.profiler.trace(args.out):
        for _ in range(3):
            state, m = step(state, batch)
        jax.block_until_ready(m["loss"])

    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    import subprocess

    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 os.pardir, "tools", "parse_xplane.py"),
                    args.out, "--steps", "3"])


if __name__ == "__main__":
    main()
