#!/usr/bin/env python
"""Capture a jax.profiler trace of the joint/OGM train step (the main.py
driver lineage bench.py anchors as ogm_clips_per_sec) and print the
op-category breakdown via tools/parse_xplane.py.

Diagnostic knobs isolate the step's cost layers: --modulation Normal
drops the OGM block (coefficients + noise + where), --no_diversity
drops the per-modality feature-diversity diagnostics, and the default
runs the full shipping OGM_GE configuration.

    python benchmarks/profile_joint_step.py [--batch 64]
           [--modulation OGM_GE|OGM|Normal] [--no_diversity]
           [--out /tmp/ogm_prof]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=64, type=int)
    ap.add_argument("--modulation", default="OGM_GE",
                    choices=["OGM_GE", "OGM", "Normal"])
    ap.add_argument("--no_diversity", action="store_true",
                    help="diagnostic: stub the feature-diversity metrics "
                         "to attribute their einsum cost in profiles")
    ap.add_argument("--out", default="/tmp/ogm_prof")
    args = ap.parse_args()

    from gdl_tpu.utils.compilation_cache import enable
    enable()
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.data.preprocess import make_train_preprocess
    from gdl_tpu.data.synthetic import synthetic_batch
    from gdl_tpu.models.classifier import AVClassifier
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train import joint as joint_mod
    from gdl_tpu.train.optim import make_optimizer

    if args.no_diversity:
        joint_mod.feature_diversity = lambda f: jnp.zeros((), jnp.float32)

    batch_size = args.batch
    steps_per_epoch = max(6698 // batch_size, 1)
    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 fps=1, batch_size=batch_size, learning_rate=2e-3,
                 alpha=0.3, modulation=args.modulation, modulation_starts=0,
                 modulation_ends=50, compute_dtype="bfloat16",
                 log_grad_csv=False)
    model = AVClassifier(config=cfg, dtype=jnp.bfloat16)
    optimizer = make_optimizer(cfg, steps_per_epoch, clip_norm=None)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, optimizer)
    preprocess = make_train_preprocess(cfg)
    raw_step = joint_mod.make_joint_train_step(
        model, cfg, optimizer, steps_per_epoch, preprocess=preprocess,
        base_rng=rng)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch_size, seed=1).items()}
    step = jax.jit(raw_step, donate_argnums=(0,))
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
