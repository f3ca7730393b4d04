"""Joint-training path (main.py lineage): diversity diagnostic vs a torch
oracle, KL regurize math, PE/drop wiring, OGM-live train step, and an
end-to-end synthetic run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gdl_tpu.config import Config
from gdl_tpu.data.synthetic import SyntheticDataset
from gdl_tpu.models.classifier import AVClassifier
from gdl_tpu.train.joint import (
    feature_diversity,
    joint_loss_fn,
    make_joint_train_step,
    regurize,
)
from gdl_tpu.train.optim import make_optimizer
from gdl_tpu.train.dgl import create_train_state

TINY = dict(encoder_width=8, encoder_stages=[1, 1, 1, 1], fps=2)


def test_feature_diversity_matches_torch_oracle():
    """main.py:77-89 ported to NHWC; oracle is the reference math written
    independently in torch (NCHW)."""
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((3, 4, 5, 6)).astype(np.float32)  # NHWC
    ours = float(feature_diversity(jnp.asarray(feat)))

    t = torch.from_numpy(feat.transpose(0, 3, 1, 2))  # NCHW
    f = t.reshape(t.shape[0], t.shape[1], -1).permute(0, 2, 1)  # B HW C
    f = f - torch.mean(f, dim=2, keepdim=True)
    sim = torch.bmm(f, f.permute(0, 2, 1))
    std = torch.std(f, dim=2)
    stdm = torch.bmm(std.unsqueeze(2), std.unsqueeze(1))
    sim = sim / stdm
    ref = float(torch.mean(torch.norm(sim, dim=(1, 2))
                           / sim.shape[1] ** 2))
    assert np.isclose(ours, ref, rtol=1e-4)


def test_regurize_kl_math():
    """KL(N(mu, std²) ‖ N(0, 1)) (main.py:92-102); zero at (mu=0, std=1)."""
    mu = jnp.zeros((4, 8))
    std = jnp.ones((4, 8))
    assert np.isclose(float(regurize(mu, std)), 0.0, atol=1e-5)
    mu2 = jnp.full((2, 3), 2.0)
    std2 = jnp.ones((2, 3))
    # per-feature KL = 0.5 * mu² = 2.0 → sum over 3 features = 6
    assert np.isclose(float(regurize(mu2, std2)), 6.0, rtol=1e-5)


def build(pe=0, drop=0, modulation="Normal", beta=0.0):
    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=1.0,
                 pe=pe, drop=drop, beta=beta, modulation=modulation,
                 log_grad_csv=False, **TINY)
    model = AVClassifier(config=cfg)
    optimizer = make_optimizer(cfg, steps_per_epoch=5)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), optimizer,
                               image_size=32)
    return cfg, model, optimizer, state


def tiny_batch(b=4, f=33, t=20, img=32):
    r = jax.random.PRNGKey(9)
    ra, rv, rl = jax.random.split(r, 3)
    return {"audio": jax.random.normal(ra, (b, f, t, 1)),
            "visual": jax.random.normal(rv, (b, 2, img, img, 3)),
            "label": jax.random.randint(rl, (b,), 0, 6)}


def test_eleven_tuple_contract_pe_sentinel():
    """pe=0 → int 0 sentinels for mu/std (main.py:191-202 isinstance
    check)."""
    cfg, model, _, state = build(pe=0)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      tiny_batch()["audio"], tiny_batch()["visual"],
                      train=False)
    assert len(out) == 11
    a, v, logits, a_feat, v_feat, a_mul, a_std, v_mul, v_std, oa, ov = out
    assert isinstance(a_mul, int) and a_mul == 0
    assert logits.shape == (4, 6)
    assert a_feat.ndim == 4 and v_feat.ndim == 4


def test_pe_branch_contributes_kl_loss():
    cfg, model, _, state = build(pe=1, beta=1e-3)
    batch = tiny_batch()
    loss, (_, metrics) = joint_loss_fn(
        model, state.params, state.batch_stats, batch, cfg,
        jax.random.PRNGKey(0), train=True)
    assert float(metrics["a_re"]) > 0.0
    assert float(loss) > float(metrics["loss_f"])


def test_ogm_live_train_step_changes_update():
    """OGM modulation live (unlike the shipped reference's no-op) alters
    the applied update within the epoch window."""
    batch = tiny_batch()
    outs = {}
    for modulation in ("Normal", "OGM"):
        cfg, model, optimizer, state = build(modulation=modulation)
        step = jax.jit(make_joint_train_step(model, cfg, optimizer,
                                             steps_per_epoch=5))
        new_state, metrics = step(state, batch)
        outs[modulation] = jax.device_get(new_state.params)
        assert np.isfinite(float(metrics["loss"]))
    diff = [not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(outs["Normal"]),
                            jax.tree.leaves(outs["OGM"]))]
    assert any(diff)


def test_strict_compat_disables_modulation():
    batch = tiny_batch()
    outs = {}
    for strict in (False, True):
        cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=1.0,
                     modulation="OGM", strict_compat=strict,
                     log_grad_csv=False, **TINY)
        model = AVClassifier(config=cfg)
        optimizer = make_optimizer(cfg, steps_per_epoch=5)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   optimizer, image_size=32)
        step = jax.jit(make_joint_train_step(model, cfg, optimizer,
                                             steps_per_epoch=5))
        new_state, _ = step(state, batch)
        outs[strict] = jax.device_get(new_state.params)
    # strict_compat reproduces the shipped no-op → differs from live OGM
    diff = [not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(outs[False]),
                            jax.tree.leaves(outs[True]))]
    assert any(diff)


@pytest.mark.slow
def test_joint_training_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=1.0,
                 pe=1, beta=1e-4, modulation="Normal", batch_size=8,
                 epochs=1, ckpt_path=str(tmp_path / "ckpt"), train=True,
                 num_workers=2, log_grad_csv=False, **TINY)
    from gdl_tpu.train.loop import run_training

    model = AVClassifier(config=cfg)
    train_set = SyntheticDataset(cfg, size=16)
    test_set = SyntheticDataset(cfg, size=8, seed=50)
    run_training(cfg, model, train_set, test_set, dgl=False)


def test_feature_diff_mse():
    from gdl_tpu.train.joint import feature_diff

    x = jnp.ones((2, 7, 7, 4))
    y = jnp.zeros((2, 7, 7, 4))
    assert np.isclose(float(feature_diff(x, y)), 1.0)
    # differently-sized maps are pooled to 7x7 first
    z = jnp.ones((2, 9, 6, 4))
    assert np.isclose(float(feature_diff(x, z)), 0.0, atol=1e-6)
