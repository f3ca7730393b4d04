"""Optimizer/schedule numerics vs the reference's torch semantics.

- SGD chain == torch SGD(momentum=0.9, weight_decay=1e-4 COUPLED) preceded
  by clip_grad_norm_(40) (main_dgl.py:129, :248-250)
- MultiStepLR with the scheduler-at-epoch-top quirk (main_dgl.py:73-74):
  milestone 70 decays the LR for epoch 69 (0-indexed) already
- GradualWarmupScheduler(multiplier=1) linear warmup (main.py:360-422)
- OGM / OGM-GE coefficients and masking (main.py:286-332 spec)
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gdl_tpu.config import Config
from gdl_tpu.train.optim import (
    apply_ogm,
    lr_for_epoch,
    make_lr_schedule,
    make_optimizer,
    ogm_coefficients,
)


def test_sgd_chain_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((5, 3)).astype(np.float32)
    grads = [rng.standard_normal((5, 3)).astype(np.float32) * 30
             for _ in range(4)]  # large grads so the clip triggers

    # torch reference loop
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, weight_decay=1e-4)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([tw], max_norm=40)
        opt.step()

    # ours
    cfg = Config(optimizer="sgd", learning_rate=0.01, lr_decay_step=[])
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_multistep_epoch_top_quirk():
    cfg = Config(optimizer="sgd", learning_rate=0.002, lr_decay_step=[70],
                 lr_decay_ratio=0.1)
    assert lr_for_epoch(cfg, 0) == 0.002
    assert lr_for_epoch(cfg, 68) == 0.002
    # milestone 70 fires at the TOP of epoch 69 in the reference
    assert np.isclose(lr_for_epoch(cfg, 69), 0.0002)
    assert np.isclose(lr_for_epoch(cfg, 99), 0.0002)

    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    # last step of epoch 68 still at base lr; epoch 69 decayed
    assert np.isclose(float(sched(jnp.asarray(689))), 0.002, rtol=1e-6)
    assert np.isclose(float(sched(jnp.asarray(690))), 0.0002, rtol=1e-5)


def test_warmup_schedule():
    cfg = Config(optimizer="sgd", learning_rate=0.01, lr_decay_step=[30],
                 lr_decay_ratio=0.1, warmup=True, total_epoch=10)
    # GradualWarmupScheduler(multiplier=1): lr = base * (e+1)/total
    assert np.isclose(lr_for_epoch(cfg, 0), 0.001)
    assert np.isclose(lr_for_epoch(cfg, 4), 0.005)
    assert np.isclose(lr_for_epoch(cfg, 9), 0.01)
    assert np.isclose(lr_for_epoch(cfg, 15), 0.01)
    sched = make_lr_schedule(cfg, steps_per_epoch=5)
    assert np.isclose(float(sched(jnp.asarray(0))), 0.001)
    assert np.isclose(float(sched(jnp.asarray(46))), 0.01)


def test_adamw_matches_torch():
    rng = np.random.default_rng(1)
    w0 = rng.standard_normal((4, 4)).astype(np.float32)
    grads = [rng.standard_normal((4, 4)).astype(np.float32)
             for _ in range(3)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([tw], lr=1e-3, betas=(0.9, 0.999))
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([tw], max_norm=40)
        opt.step()

    cfg = Config(optimizer="Adam", learning_rate=1e-3)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_ogm_coefficients_penalize_dominant_modality():
    labels = jnp.array([0, 1])
    strong = jnp.array([[5.0, -5.0], [-5.0, 5.0]])  # near-perfect
    weak = jnp.array([[0.1, -0.1], [0.1, -0.1]])    # ~chance
    coeff_a, coeff_v = ogm_coefficients(weak, strong, labels, alpha=1.0)
    # visual dominates → coeff_v < 1, coeff_a == 1
    assert float(coeff_v) < 1.0
    assert float(coeff_a) == 1.0
    coeff_a2, coeff_v2 = ogm_coefficients(strong, weak, labels, alpha=1.0)
    assert float(coeff_a2) < 1.0
    assert float(coeff_v2) == 1.0


def test_apply_ogm_masks_to_conv_kernels_and_window():
    grads = {
        "audio_net": {"conv": {"kernel": jnp.ones((3, 3, 2, 2))},
                      "bn": {"scale": jnp.ones((2,))}},
        "visual_net": {"conv": {"kernel": jnp.ones((3, 3, 2, 2))}},
        "fusion_module": {"fc": {"kernel": jnp.ones((4, 2))}},
    }
    rng = jax.random.PRNGKey(0)
    out = apply_ogm(grads, coeff_a=0.5, coeff_v=0.25, rng=rng, mode="OGM",
                    active=jnp.asarray(True))
    np.testing.assert_allclose(
        np.asarray(out["audio_net"]["conv"]["kernel"]), 0.5)
    np.testing.assert_allclose(
        np.asarray(out["visual_net"]["conv"]["kernel"]), 0.25)
    # non-4D and non-encoder grads untouched
    np.testing.assert_allclose(np.asarray(out["audio_net"]["bn"]["scale"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(out["fusion_module"]["fc"]["kernel"]), 1.0)

    # outside the modulation window: identity
    out2 = apply_ogm(grads, 0.5, 0.25, rng, "OGM", active=jnp.asarray(False))
    np.testing.assert_allclose(
        np.asarray(out2["audio_net"]["conv"]["kernel"]), 1.0)

    # GE adds N(0, std(g)+1e-8) noise — visible with a non-constant grad
    gvar = {"audio_net": {"conv": {"kernel": jax.random.normal(
        jax.random.PRNGKey(3), (3, 3, 2, 2))}}}
    out3 = apply_ogm(gvar, 0.5, 0.25, rng, "OGM_GE", active=jnp.asarray(True))
    scaled = 0.5 * np.asarray(gvar["audio_net"]["conv"]["kernel"])
    assert not np.allclose(
        np.asarray(out3["audio_net"]["conv"]["kernel"]), scaled, atol=1e-4)

    # Normal mode: passthrough object
    assert apply_ogm(grads, 0.5, 0.25, rng, "Normal",
                     active=jnp.asarray(True)) is grads


def test_fused_global_norm_matches_optax():
    """global_norm_fused / clip_by_global_norm_fused == the optax pair to
    float-rounding (different summation association only). The fused pair
    exists because per-leaf reductions cost 8 ms/step on dual Swin-B
    (~680 leaves; benchmarks/RESULTS.md "swin levers")."""
    import optax

    from gdl_tpu.train.optim import (clip_by_global_norm_fused,
                                     global_norm_fused)

    rng = np.random.default_rng(42)
    tree = {
        "a": {"kernel": rng.standard_normal((7, 5)).astype(np.float32),
              "bias": rng.standard_normal((5,)).astype(np.float32)},
        "b": [rng.standard_normal((3, 2, 2, 4)).astype(np.float32),
              rng.standard_normal((1,)).astype(np.float32)],
    }
    tree = jax.tree.map(jnp.asarray, tree)

    got = float(global_norm_fused(tree))
    want = float(optax.global_norm(tree))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # scalar-leaf/empty edge cases
    assert float(global_norm_fused({})) == 0.0
    np.testing.assert_allclose(
        float(global_norm_fused({"s": jnp.asarray(3.0)})), 3.0, rtol=1e-7)

    for scale in (0.1, 30.0):  # below and above the max_norm trigger
        big = jax.tree.map(lambda x: x * scale, tree)
        fused = clip_by_global_norm_fused(4.0)
        ref = optax.clip_by_global_norm(4.0)
        u1, _ = fused.update(big, fused.init(big))
        u2, _ = ref.update(big, ref.init(big))
        for x, y in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-7)
