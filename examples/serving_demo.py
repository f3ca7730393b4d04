#!/usr/bin/env python
"""Train → checkpoint → AOT serving artifact → replay, end to end.

The reference has no serving story — its valid.py rebuilds the Python
model for every evaluation (/root/reference/valid.py:123-178). The
TPU-native production path (gdl_tpu/serve.py) lowers the trained eval
forward ONCE with `jax.export`, serializes it with the weights baked in,
and replays it anywhere with `.call(audio, visual)` — no Flax, no model
code, no checkpoint loading at serving time.

  1. train a tiny DGL model for a few steps on synthetic data,
  2. save a reference-schema checkpoint,
  3. build the serving artifact from the checkpoint on disk
     (the `valid.py --export_path` path),
  4. load it back and verify the served logits EQUAL the live model's.

    python examples/serving_demo.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GDL_PLATFORM", "cpu")

import gdl_tpu  # noqa: F401,E402  (applies GDL_PLATFORM before backend init)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gdl_tpu.config import Config  # noqa: E402
from gdl_tpu.models.classifier import AVClassifierDGL  # noqa: E402
from gdl_tpu.serve import export_from_checkpoint, load_exported  # noqa: E402
from gdl_tpu.train.dgl import (  # noqa: E402
    TrainState,
    create_train_state,
    make_dgl_train_step,
)
from gdl_tpu.train.optim import make_optimizer  # noqa: E402
from gdl_tpu.utils.checkpoint import save_legacy_checkpoint  # noqa: E402


def main():
    tmp = tempfile.mkdtemp(prefix="gdl_serve_")
    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 fps=1, batch_size=4, encoder_width=8,
                 encoder_stages=[1, 1, 1, 1], ckpt_path=tmp,
                 log_grad_csv=False)
    model = AVClassifierDGL(config=cfg)
    opt = make_optimizer(cfg, 100)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt)
    step = jax.jit(make_dgl_train_step(model, cfg, opt))
    rng = np.random.default_rng(0)
    f, t = cfg.spec_shape
    for i in range(3):
        batch = {"audio": jnp.asarray(
                     rng.standard_normal((4, f, t, 1)), jnp.float32),
                 "visual": jnp.asarray(
                     rng.standard_normal((4, 1, 224, 224, 3)), jnp.float32),
                 "label": jnp.asarray(rng.integers(0, 6, 4), jnp.int32)}
        state, metrics = step(state, batch)
    print(f"trained 3 steps, loss {float(metrics['loss']):.4f}")

    ckpt = save_legacy_checkpoint(cfg, state, epoch=3, acc=0.5)
    print("checkpoint:", os.path.basename(ckpt))

    artifact = os.path.join(tmp, "model.hlo")
    export_from_checkpoint(cfg, ckpt, artifact, batch_size=4)
    print(f"serving artifact: {artifact} "
          f"({os.path.getsize(artifact) / 1e6:.2f} MB, weights baked in)")

    audio = jnp.asarray(rng.standard_normal((4, f, t, 1)), jnp.float32)
    visual = jnp.asarray(rng.standard_normal((4, 1, 224, 224, 3)),
                         jnp.float32)
    served = load_exported(artifact).call(audio, visual)
    live = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats},
                       audio, visual, train=False)
    err = max(float(jnp.abs(s - l).max()) for s, l in zip(served, live))
    print(f"served vs live logits max |diff|: {err:.2e}")
    assert err < 1e-5
    print("OK — the artifact replays the trained model with no model code")

    # batch-polymorphic variant: ONE artifact, any batch size
    # (valid.py --export_poly_batch 1)
    poly = os.path.join(tmp, "model_poly.hlo")
    export_from_checkpoint(cfg, ckpt, poly, poly_batch=True)
    loaded = load_exported(poly)
    for bs in (1, 7):
        out = loaded.call(
            jnp.asarray(rng.standard_normal((bs, f, t, 1)), jnp.float32),
            jnp.asarray(rng.standard_normal((bs, 1, 224, 224, 3)),
                        jnp.float32))
        assert out[0].shape == (bs, 6)
    print("OK — the poly-batch artifact served batch sizes 1 and 7")


if __name__ == "__main__":
    main()
