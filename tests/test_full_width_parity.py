"""Full-width (flagship) torch cross-verification — VERDICT round-2 item 1.

Round 2's torch oracles all ran at width 8 / stages (1,1,1,1); nothing
checked the 22.4 M-param flagship (width 64, stages [2,2,2,2],
backbone.py:107-113 resnet18) against torch at its real width, where
width-dependent divergence (BN eps interplay, padding, pooling, channel
reductions) would live. This file:

  1. forward logits parity at FULL width and REAL CREMA-D shapes
     (spec 257x188, two 224^2 frames) with randomized BN running stats,
     through the .pth interop (main_dgl.py:108-129 / valid.py:148);
  2. two FULL-WIDTH training steps of the verbatim reference loop
     (clip ACTIVE) tracking losses and final params.

Both run EAGERLY (no jit): a w64 train-step compile is minutes on the
1-core CI host, and eager jax == jit numerics at fp32 for these graphs.
Measured deviations are recorded in PARITY.md.
"""

import numpy as np
import torch

from gdl_tpu.config import Config
from tests.test_torch_interop import TorchAVClassifierDGL
from tests.test_trajectory_parity import _our_loop, _reference_torch_loop

WIDTH = 64
STAGES = (2, 2, 2, 2)
N_CLASSES = 6


def _flagship_cfg(batch):
    return Config(dataset="CREMAD", fusion_method="concat", modality="full",
                  modulation="Normal", fps=2, batch_size=batch, alpha=4.0,
                  learning_rate=0.01, optimizer="sgd",
                  lr_decay_step=[10 ** 6], encoder_width=WIDTH,
                  encoder_stages=list(STAGES), log_grad_csv=False)


def _init_flax(cfg, spec_hw, img_hw, frames):
    import jax
    import jax.numpy as jnp

    from gdl_tpu.models.classifier import AVClassifierDGL

    model = AVClassifierDGL(config=cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1,) + spec_hw + (1,)),
        jnp.zeros((1, frames) + img_hw + (3,)), train=False)
    return model, variables


def _torch_oracle_from(variables):
    from gdl_tpu.utils.torch_interop import flax_to_torch_state_dict

    tmodel = TorchAVClassifierDGL(width=WIDTH, stages=STAGES,
                                  n_classes=N_CLASSES)
    sd = flax_to_torch_state_dict(variables["params"],
                                  variables["batch_stats"], prefix="")
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                            for k, v in sd.items()}, strict=True)
    return tmodel


def test_flagship_forward_parity_full_width_real_shapes():
    import jax.numpy as jnp

    cfg = _flagship_cfg(batch=2)
    f, t = cfg.spec_shape  # (257, 188) — the real CREMA-D spectrogram
    model, variables = _init_flax(cfg, (f, t), (224, 224), frames=2)

    # randomize BN running stats so the eval path exercises the real
    # mean/var mapping at width 64 (not the trivial 0/1 init)
    rng = np.random.default_rng(7)

    def perturb(tree):
        import jax

        def one(path, leaf):
            name = getattr(path[-1], "key", "")
            arr = np.asarray(leaf)
            if name == "mean":
                return jnp.asarray(
                    0.1 * rng.standard_normal(arr.shape).astype(np.float32))
            if name == "var":
                return jnp.asarray(
                    (1.0 + 0.5 * rng.random(arr.shape)).astype(np.float32))
            return leaf

        return jax.tree_util.tree_map_with_path(one, tree)

    variables = {"params": variables["params"],
                 "batch_stats": perturb(variables["batch_stats"])}
    tmodel = _torch_oracle_from(variables).eval()

    spec = rng.standard_normal((2, f, t, 1)).astype(np.float32)
    image = rng.standard_normal((2, 2, 224, 224, 3)).astype(np.float32)

    out, out_a, out_v = model.apply(
        variables, jnp.asarray(spec), jnp.asarray(image), train=False)
    with torch.no_grad():
        t_a, t_v, t_out = tmodel(
            torch.from_numpy(spec.transpose(0, 3, 1, 2)),
            torch.from_numpy(image.transpose(0, 4, 1, 2, 3)))

    # fp32 eval forward at width 64: measured max |Δ| ~1e-5 over logits of
    # magnitude ~1 (PARITY.md); 5e-4 leaves room for BLAS variation
    for ours, theirs in ((out, t_out), (out_a, t_a), (out_v, t_v)):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=5e-4, atol=5e-4)


def test_flagship_two_train_steps_full_width():
    """Two verbatim reference-loop steps (clip ACTIVE, main_dgl.py:108-154)
    at width 64 / stages [2,2,2,2]. Spatial dims are reduced (64x48 spec,
    two 64^2 frames) to keep the eager CPU step tractable — width, not
    spatial size, is what round 2 never exercised."""
    cfg = _flagship_cfg(batch=4)
    model, variables = _init_flax(cfg, (64, 48), (64, 64), frames=2)
    tmodel = _torch_oracle_from(variables)

    rng = np.random.default_rng(42)
    batches = []
    for _ in range(2):
        spec = rng.standard_normal((4, 1, 64, 48)).astype(np.float32)
        image = rng.standard_normal((4, 3, 2, 64, 64)).astype(np.float32)
        label = rng.integers(0, N_CLASSES, 4).astype(np.int64)
        batches.append((spec, image, label))

    from gdl_tpu.utils.torch_interop import flax_to_torch_state_dict

    # Measured (PARITY.md): after ONE step the worst param |Δ| is 4.8e-5
    # (the update rule is exact at w64); after TWO the ACTIVE clip's
    # 40/||g|| rescale has amplified fp32 ordering noise to ~2e-3 — same
    # compounding the tiny-width 4-step test documents, not a semantic
    # delta. So: tight assert after step 1, envelope after step 2.
    param_atol = {1: 5e-4, 2: 8e-3}
    for nsteps in (1, 2):
        tm = _torch_oracle_from(variables)
        ref_losses = _reference_torch_loop(tm, batches[:nsteps])
        our_losses, final_state = _our_loop(variables, batches[:nsteps],
                                            cfg, jit=False)
        for k, (r, o) in enumerate(zip(ref_losses, our_losses)):
            np.testing.assert_allclose(o, r, rtol=2e-4 * (k + 1),
                                       atol=2e-4 * (k + 1),
                                       err_msg=f"step {k}")

        ours = flax_to_torch_state_dict(final_state.params,
                                        final_state.batch_stats, prefix="")
        theirs = {k: v.detach().numpy()
                  for k, v in tm.state_dict().items()}
        checked = 0
        for k, v in ours.items():
            if k.endswith(("running_mean", "running_var",
                           "num_batches_tracked")):
                continue
            np.testing.assert_allclose(
                v, theirs[k], rtol=1e-2, atol=param_atol[nsteps],
                err_msg=f"param {k} diverged after {nsteps} w64 steps")
            checked += 1
        assert checked > 100  # the flagship has 100+ learnable tensors
        # running means track too (batch-stat update rule at width 64);
        # step-2 batch means inherit the clip-amplified param noise
        rm_atol = {1: 1e-4, 2: 5e-4}[nsteps]
        for k, v in ours.items():
            if k.endswith("running_mean"):
                np.testing.assert_allclose(v, theirs[k], rtol=2e-2,
                                           atol=rm_atol, err_msg=k)
