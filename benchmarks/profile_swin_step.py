#!/usr/bin/env python
"""Capture a jax.profiler trace of the dual Swin-B joint train step and
print the op-category breakdown (tools/parse_xplane.py analyzer).

    python benchmarks/profile_swin_step.py [--pallas] [--resident 0|1]
           [--out /tmp/swin_prof]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--resident", default=1, type=int)
    ap.add_argument("--batch", default=16, type=int)
    ap.add_argument("--out", default="/tmp/swin_prof")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierSwin
    from gdl_tpu.train.joint import make_joint_train_step
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", fusion_method="concat", backbone="swin",
                 alpha=1.0, batch_size=args.batch,
                 compute_dtype="bfloat16", modulation="Normal",
                 log_grad_csv=False, fps=1, use_pallas_attn=args.pallas,
                 swin_window_resident=bool(args.resident))
    model = AVClassifierSwin(config=cfg, dtype=jnp.bfloat16)
    opt = make_optimizer(cfg, 100)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt,
                               spec_shape=(224, 224), frames=1)
    r = jax.random.PRNGKey(1)
    batch = {"audio": jax.random.normal(r, (args.batch, 224, 224, 1)),
             "visual": jax.random.normal(r, (args.batch, 1, 224, 224, 3)),
             "label": jnp.zeros((args.batch,), jnp.int32)}
    step = jax.jit(make_joint_train_step(model, cfg, opt, 100),
                   donate_argnums=(0,))
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
