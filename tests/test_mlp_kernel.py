"""Fused transformer-MLP Pallas kernel (ops/mlp.py): interpret-mode
equivalence vs the nn.Dense->gelu->nn.Dense chain it replaces
(reference models/swin_transformer.py Mlp, :64-80), recompute-backward
gradient parity, and the shape-support predicate at the real Swin-B
stage shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdl_tpu.ops.mlp import (mlp_fused, mlp_kernel_supported, mlp_ref,
                             pick_m_block)


def _params(rng, c, h, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = [jnp.asarray(a, dtype) for a in (
        rng.standard_normal((64, c)) * 0.5,
        rng.standard_normal((c, h)) * 0.05,
        rng.standard_normal((h,)) * 0.01,
        rng.standard_normal((h, c)) * 0.05,
        rng.standard_normal((c,)) * 0.01)]
    return k1, k2, k3, k4, k5


def _dense_chain(x, w1, b1, w2, b2):
    """What SwinBlock's XLA path computes (flax Dense = x@w + b)."""
    h = x @ w1 + b1
    g = jax.nn.gelu(h, approximate=False)
    return g @ w2 + b2


def test_pick_m_block_swin_stages():
    """bs32 dual-joint resident-layout M values; bf16 (itemsize 2)."""
    assert pick_m_block(100352, 128, 512, 2) == 1024   # stage 0
    assert pick_m_block(25088, 256, 1024, 2) == 512    # stage 1
    assert pick_m_block(6272, 512, 2048, 2) == 224     # stage 2
    # stage 3: 16.8 MB of weights — measured Mosaic scoped-vmem failure
    assert pick_m_block(1568, 1024, 4096, 2) == 0
    # lane-unaligned widths unsupported (tiny test models)
    assert pick_m_block(1024, 64, 256, 4) == 0
    assert not mlp_kernel_supported(1568, 1024, 4096, 2)


def test_fused_forward_matches_dense_chain():
    rng = np.random.default_rng(0)
    x, w1, b1, w2, b2 = _params(rng, 128, 512)
    got = mlp_fused(x, w1, b1, w2, b2, interpret=True)
    want = _dense_chain(x, w1, b1, w2, b2)
    # A&S erf approximation: 1.5e-7 max abs err, scaled by |h| ~ O(1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_backward_matches_dense_chain():
    """The recompute custom_vjp must reproduce the chain's gradients for
    every operand (x, w1, b1, w2, b2)."""
    rng = np.random.default_rng(1)
    args = _params(rng, 128, 512)

    def loss_fused(*a):
        return jnp.sum(jnp.square(mlp_fused(*a, interpret=True)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(_dense_chain(*a)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4)


def test_unsupported_shape_falls_back_to_ref():
    """c=64 is lane-unaligned: mlp_fused must route to mlp_ref (bitwise)
    and stay differentiable."""
    rng = np.random.default_rng(2)
    x, w1, b1, w2, b2 = _params(rng, 64, 256)
    got = mlp_fused(x, w1, b1, w2, b2)
    want = mlp_ref(x, w1, b1, w2, b2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    g = jax.grad(lambda *a: jnp.sum(mlp_fused(*a)),
                 argnums=(0, 1))(x, w1, b1, w2, b2)
    assert all(np.isfinite(np.asarray(gi)).all() for gi in g)


def test_bf16_forward_within_bf16_noise():
    rng = np.random.default_rng(3)
    x, w1, b1, w2, b2 = _params(rng, 128, 512, jnp.bfloat16)
    got = np.asarray(mlp_fused(x, w1, b1, w2, b2, interpret=True),
                     np.float32)
    want = np.asarray(_dense_chain(x.astype(jnp.float32),
                                   w1.astype(jnp.float32),
                                   b1.astype(jnp.float32),
                                   w2.astype(jnp.float32),
                                   b2.astype(jnp.float32)), np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert err < 0.05, err


def test_swin_block_fused_mlp_integration(monkeypatch):
    """SwinBlock with fuse_mlp=True: identical param tree AND init bits
    to the Dense chain (checkpoint/interop compatibility), forward
    equivalence, and a finite training gradient through the recompute
    custom_vjp. dim=128 / 14x14 / b=2 -> M=392, the smallest supported
    shape; attention stays on the XLA path (use_pallas=False) so only
    the MLP branch differs."""
    import gdl_tpu.models.swin as swin_mod
    from gdl_tpu.models.swin import SwinBlock

    monkeypatch.setattr(swin_mod, "is_tpu_backend", lambda: True)
    kw = dict(dim=128, resolution=(14, 14), num_heads=4, window=7,
              shift=0, use_pallas=False, drop_path=0.0)
    plain = SwinBlock(fuse_mlp=False, **kw)
    fused = SwinBlock(fuse_mlp=True, **kw)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 196, 128)), jnp.float32)

    vp = plain.init(jax.random.PRNGKey(0), x, False)
    vf = fused.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(vp) == \
        jax.tree_util.tree_structure(vf)
    for a, b in zip(jax.tree.leaves(vp), jax.tree.leaves(vf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_p = plain.apply(vp, x, False)
    out_f = fused.apply(vp, x, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)

    def loss(params):
        return jnp.sum(jnp.square(fused.apply(params, x, True)))

    g = jax.grad(loss)(vp)
    gn = float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g)))
    assert np.isfinite(gn) and gn > 0
    # the fused-path gradient must match the Dense chain's
    g_ref = jax.grad(lambda p: jnp.sum(jnp.square(
        plain.apply(p, x, True))))(vp)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
