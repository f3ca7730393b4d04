#!/usr/bin/env python
"""Hardware A/B: OGM-GE noise stream re-keyed as 'rbg' vs threefry.

The GE noise draws are param-sized (one normal per encoder conv kernel,
~22M elements total on dual ResNet-18). With the default threefry PRNG
those lower to per-element hash fusions between the backward pass and
the optimizer; fast_dropout_rng re-keys k_ogm as an 'rbg' key so each
draw is one RngBitGenerator op (the round-3 mmformer pattern,
benchmarks/RESULTS.md). Run on the real TPU; one JSON line per arm.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(fast: bool):
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.data.preprocess import make_train_preprocess
    from gdl_tpu.data.synthetic import synthetic_batch
    from gdl_tpu.models.classifier import AVClassifier
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.joint import make_joint_train_step
    from gdl_tpu.train.optim import make_optimizer
    from bench import _chained_ms_per_step

    batch_size = 64
    steps_per_epoch = max(6698 // batch_size, 1)
    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 fps=1, batch_size=batch_size, learning_rate=2e-3,
                 alpha=0.3, modulation="OGM_GE", modulation_starts=0,
                 modulation_ends=50, compute_dtype="bfloat16",
                 log_grad_csv=False, fast_dropout_rng=fast)
    model = AVClassifier(config=cfg, dtype=jnp.bfloat16)
    optimizer = make_optimizer(cfg, steps_per_epoch, clip_norm=None)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, optimizer)
    preprocess = make_train_preprocess(cfg)
    raw_step = make_joint_train_step(model, cfg, optimizer, steps_per_epoch,
                                     preprocess=preprocess, base_rng=rng)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch_size, seed=1).items()}
    dt = _chained_ms_per_step(raw_step, state, batch, 10)
    return batch_size / dt, dt * 1e3


def main():
    from gdl_tpu.utils.compilation_cache import enable
    enable()
    for arm, fast in (("threefry", False), ("rbg", True)):
        t0 = time.perf_counter()
        clips, ms = measure(fast)
        print(json.dumps({"arm": arm, "clips_per_sec": round(clips, 2),
                          "ms_per_step": round(ms, 3),
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
