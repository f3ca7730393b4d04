#!/usr/bin/env python
"""DGL vs joint training on imbalanced synthetic multimodal data.

The paper's setting: one modality (audio: class-coded tones, high SNR)
dominates; joint multimodal training then under-optimizes the weak modality
(visual: noisy class-coded brightness). DGL trains each encoder only
through its own scaled unimodal loss, so the weak modality keeps learning.

Runs on anything (one TPU chip: ~2 min; CPU: slower). Prints fused and
per-modality accuracies for both optimization topologies.

    python examples/dgl_vs_joint_demo.py [--steps 150] [--alpha 2.0]

Recorded run (TPU v5e, --steps 120, 2026-08-16):
     joint: fused 1.000  audio 1.000  visual 0.680
       dgl: fused 1.000  audio 1.000  visual 0.781
The visual Bayes ceiling here is 0.775 (30% of frames carry a wrong class)
— DGL drives the weak stream to its ceiling; joint training leaves it
under-optimized, exactly the imbalance the paper targets.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gdl_tpu.config import Config
from gdl_tpu.data.preprocess import make_train_preprocess
from gdl_tpu.models.classifier import AVClassifier, AVClassifierDGL
from gdl_tpu.train.dgl import create_train_state, make_dgl_train_step
from gdl_tpu.train.joint import make_joint_train_step
from gdl_tpu.train.optim import make_optimizer

IMG = 48
N_CLASSES = 4


def make_batch(key, b=32, noise_v=0.9):
    """Audio: clean class tone. Visual: class brightness + heavy noise, and
    30% of frames carry a WRONG class's brightness (weak modality)."""
    kl, kn, kw, kc = jax.random.split(key, 4)
    labels = jax.random.randint(kl, (b,), 0, N_CLASSES)
    n = 22050 * 3
    t = jnp.arange(n) / 22050.0
    freqs = 150.0 * (1.0 + labels[:, None].astype(jnp.float32))
    wave = 0.4 * jnp.sin(2 * jnp.pi * freqs * t[None, :])
    wave = wave + 0.05 * jax.random.normal(kn, wave.shape)

    corrupt = jax.random.bernoulli(kw, 0.3, (b,))
    vis_label = jnp.where(corrupt,
                          jax.random.randint(kc, (b,), 0, N_CLASSES), labels)
    gray = (50 + 40 * vis_label).astype(jnp.float32)
    frames = gray[:, None, None, None, None] + noise_v * 40.0 * \
        jax.random.normal(kn, (b, 1, IMG, IMG, 3))
    frames = jnp.clip(frames, 0, 255).astype(jnp.uint8)
    return {"wave": wave.astype(jnp.float32), "frames": frames,
            "label": labels}


def run(mode: str, steps: int, alpha: float, seed: int = 0):
    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=alpha,
                 learning_rate=0.02, lr_decay_step=[10 ** 6],
                 encoder_width=16, encoder_stages=[1, 1, 1, 1], fps=1,
                 log_grad_csv=False, modulation="Normal", random_seed=seed)
    # CREMAD has 6 classes; use 4 of them
    model_cls = AVClassifierDGL if mode == "dgl" else AVClassifier
    model = model_cls(config=cfg)
    opt = make_optimizer(cfg, steps_per_epoch=10 ** 6)
    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, cfg, rng, opt, image_size=IMG)
    pre = make_train_preprocess(cfg, image_size=IMG)
    if mode == "dgl":
        step = jax.jit(make_dgl_train_step(model, cfg, opt, preprocess=pre,
                                           base_rng=rng))
    else:
        step = jax.jit(make_joint_train_step(model, cfg, opt, 10 ** 6,
                                             preprocess=pre, base_rng=rng))

    key = jax.random.PRNGKey(100 + seed)
    for i in range(steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, make_batch(k))

    # held-out eval
    correct = {"fused": 0, "audio": 0, "visual": 0}
    total = 0
    ekey = jax.random.PRNGKey(999)
    vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    for i in range(8):
        ekey, k = jax.random.split(ekey)
        batch = make_batch(k)
        proc = pre(batch, jax.random.PRNGKey(0))
        if mode == "dgl":
            out, out_a, out_v = model.apply(vars_, proc["audio"],
                                            proc["visual"], train=False)
        else:
            o = model.apply(vars_, proc["audio"], proc["visual"],
                            train=False)
            out, out_a, out_v = o[2], o[9], o[10]
        for name, logits in [("fused", out), ("audio", out_a),
                             ("visual", out_v)]:
            correct[name] += int(jnp.sum(jnp.argmax(logits, -1)
                                         == batch["label"]))
        total += batch["label"].shape[0]
    return {k: v / total for k, v in correct.items()}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--alpha", type=float, default=2.0)
    args = parser.parse_args()

    print(f"devices: {jax.devices()}")
    results = {}
    for mode in ("joint", "dgl"):
        results[mode] = run(mode, args.steps, args.alpha)
        r = results[mode]
        print(f"{mode:>6}: fused {r['fused']:.3f}  audio {r['audio']:.3f}  "
              f"visual {r['visual']:.3f}", flush=True)
    print("\nDGL trains each encoder through its own unimodal loss — the "
          "weak (visual) stream keeps learning instead of being dominated "
          "by the strong (audio) one.")


if __name__ == "__main__":
    main()
