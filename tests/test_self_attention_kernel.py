"""Fused self-attention kernel (ops/self_attention.py) equality tests —
interpret mode on CPU, against the XLA path it replaces (the
models/transformer.py SelfAttention math, reference lib Transformer.py:
17-51). Dropout is exercised EXACTLY: the kernel's mask generation is
replayed outside and applied in an XLA oracle, so forward and backward
must match to fp32 tolerance, mask and all."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdl_tpu.ops.self_attention import (
    _round_up,
    self_attention_fused,
    self_attention_qkv,
    self_attention_xla,
)

CASES = [
    dict(b=4, n=20, heads=4, c=128),   # g=4 (d=32)
    dict(b=2, n=52, heads=8, c=512),   # g=2 (d=64) — the mmformer shape
    dict(b=3, n=9, heads=2, c=256),    # odd N -> padded rows live
    dict(b=2, n=16, heads=4, c=128),   # N == n_pad -> static where-skip
]


def _qkv(b, n, c, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, n, 3, c)).astype(np.float32))


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_xla(case):
    qkv = _qkv(case["b"], case["n"], case["c"])
    ours = self_attention_qkv(qkv, case["heads"])
    ref = self_attention_xla(qkv, case["heads"])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", CASES[:2])
def test_gradient_matches_xla(case):
    qkv = _qkv(case["b"], case["n"], case["c"], seed=1)
    cot = _qkv(case["b"], case["n"], case["c"], seed=2)[:, :, 0, :]

    def loss_k(x):
        return jnp.sum(self_attention_qkv(x, case["heads"]) * cot)

    def loss_x(x):
        return jnp.sum(self_attention_xla(x, case["heads"]) * cot)

    gk = jax.grad(loss_k)(qkv)
    gx = jax.grad(loss_x)(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=2e-4, atol=2e-4)


def _mask_bhnn(rng, rate, b, n, heads, c):
    """Replay self_attention_qkv's mask generation and unpack the packed
    [hg, B, g*Np, Np] layout to [B, H, N, N] for the XLA oracle."""
    d = c // heads
    g = 128 // d
    hg = heads // g
    n_pad = _round_up(n, 8)
    keep = jax.random.bernoulli(rng, 1.0 - rate, (hg, b, g * n_pad, n_pad))
    maskp = keep.astype(jnp.float32) / (1.0 - rate)
    m = maskp.reshape(hg, b, g, n_pad, n_pad).transpose(1, 0, 2, 3, 4)
    return maskp, m.reshape(b, heads, n_pad, n_pad)[:, :, :n, :n]


def _xla_with_mask(qkv, heads, mask_bhnn):
    b, n, _, c = qkv.shape
    d = c // heads
    x = qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = x[0], x[1], x[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * d ** -0.5, axis=-1) * mask_bhnn
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(qkv.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


@pytest.mark.parametrize("case", CASES[:2])
def test_dropout_forward_and_grad_match_mask_oracle(case):
    b, n, heads, c = case["b"], case["n"], case["heads"], case["c"]
    rate = 0.3
    qkv = _qkv(b, n, c, seed=3)
    cot = _qkv(b, n, c, seed=4)[:, :, 0, :]
    rng = jax.random.PRNGKey(7)

    _, m_bhnn = _mask_bhnn(rng, rate, b, n, heads, c)
    # vacuity guard: the mask actually drops entries
    dropped = float(jnp.mean((m_bhnn == 0).astype(jnp.float32)))
    assert 0.1 < dropped < 0.5

    def loss_k(x):
        return jnp.sum(self_attention_qkv(
            x, heads, dropout_rate=rate, dropout_rng=rng, train=True) * cot)

    def loss_x(x):
        return jnp.sum(_xla_with_mask(x, heads, m_bhnn) * cot)

    np.testing.assert_allclose(
        np.asarray(self_attention_qkv(qkv, heads, dropout_rate=rate,
                                      dropout_rng=rng, train=True)),
        np.asarray(_xla_with_mask(qkv, heads, m_bhnn)),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(loss_k)(qkv)),
                               np.asarray(jax.grad(loss_x)(qkv)),
                               rtol=3e-4, atol=3e-4)


def test_kernel_impl_falls_back_to_hbm_off_tpu():
    """dropout_impl='kernel' needs the Mosaic PRNG (TPU-only); off-TPU
    it must silently take the 'hbm' path — identical output, same mask.
    (The TPU-side semantics are verified on hardware by
    tools/verify_kernel_dropout.py.)"""
    b, n, heads, c = 2, 52, 8, 512
    qkv = _qkv(b, n, c, seed=5)
    rng = jax.random.PRNGKey(11)
    kw = dict(dropout_rate=0.3, dropout_rng=rng, train=True)
    a = self_attention_qkv(qkv, heads, dropout_impl="kernel", **kw)
    h = self_attention_qkv(qkv, heads, dropout_impl="hbm", **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(h))


def test_fold_seed_words_key_formats():
    """The Mosaic-PRNG seed fold accepts typed keys, raw threefry
    2-word data, and rbg 4-word data; (2,) i32, deterministic, and
    key-dependent."""
    from gdl_tpu.ops.self_attention import _fold_seed_words

    typed = jax.random.PRNGKey(3)
    raw2 = jax.random.key_data(typed)
    raw4 = jnp.arange(4, dtype=jnp.uint32)
    for k in (typed, raw2, raw4):
        s = _fold_seed_words(k)
        assert s.shape == (2,) and s.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(s),
                                      np.asarray(_fold_seed_words(k)))
    # typed key and its own key_data fold identically
    np.testing.assert_array_equal(np.asarray(_fold_seed_words(typed)),
                                  np.asarray(_fold_seed_words(raw2)))
    # different keys -> different seed words
    assert not np.array_equal(
        np.asarray(_fold_seed_words(jax.random.PRNGKey(3))),
        np.asarray(_fold_seed_words(jax.random.PRNGKey(4))))


def _xw(b, n, c, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((c, 3 * c)) / np.sqrt(c)
                     ).astype(np.float32))
    return x, w


@pytest.mark.parametrize("case", CASES)
def test_fused_forward_matches_xla(case):
    """self_attention_fused(x, W) == the XLA oracle on qkv = x @ W —
    the in-kernel projection GEMM changes the layout path, not the
    math."""
    b, n, heads, c = case["b"], case["n"], case["heads"], case["c"]
    x, w = _xw(b, n, c, seed=6)
    ours = self_attention_fused(x, w, heads)
    ref = self_attention_xla((x @ w).reshape(b, n, 3, c), heads)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", CASES[:2])
def test_fused_gradient_matches_xla(case):
    """dx AND dW through the fused entry (custom_vjp: shared dqkv kernel
    + XLA dx/dW GEMMs) match autodiff through the XLA oracle."""
    b, n, heads, c = case["b"], case["n"], case["heads"], case["c"]
    x, w = _xw(b, n, c, seed=7)
    cot = _qkv(b, n, c, seed=8)[:, :, 0, :]

    def loss_k(x, w):
        return jnp.sum(self_attention_fused(x, w, heads) * cot)

    def loss_x(x, w):
        return jnp.sum(self_attention_xla(
            (x @ w).reshape(b, n, 3, c), heads) * cot)

    gk = jax.grad(loss_k, argnums=(0, 1))(x, w)
    gx = jax.grad(loss_x, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gx[1]),
                               rtol=2e-4, atol=2e-4)


def test_fused_dropout_matches_qkv_path():
    """With the same rng the fused entry draws the SAME 'hbm' mask as the
    qkv-input entry — forward and input-gradient agree to fp32
    tolerance (only the projection GEMM moved inside)."""
    b, n, heads, c = 2, 52, 8, 512
    rate = 0.3
    x, w = _xw(b, n, c, seed=9)
    rng = jax.random.PRNGKey(13)
    kw = dict(dropout_rate=rate, dropout_rng=rng, train=True,
              dropout_impl="hbm")
    fused = self_attention_fused(x, w, heads, **kw)
    split = self_attention_qkv((x @ w).reshape(b, n, 3, c), heads, **kw)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                               rtol=2e-5, atol=2e-5)

    cot = _qkv(b, n, c, seed=10)[:, :, 0, :]
    gf = jax.grad(lambda xx: jnp.sum(
        self_attention_fused(xx, w, heads, **kw) * cot))(x)
    gs = jax.grad(lambda xx: jnp.sum(self_attention_qkv(
        (xx @ w).reshape(b, n, 3, c), heads, **kw) * cot))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                               rtol=3e-4, atol=3e-4)


def test_module_param_tree_and_init_preserved():
    """SelfAttention now declares the qkv kernel via _SaQkvParams instead
    of nn.Dense — the param tree (qkv/kernel) and the init draw must be
    BITWISE what nn.Dense produced (checkpoints + torch-interop name map
    stay valid)."""
    from flax import linen as nn

    from gdl_tpu.models.transformer import SelfAttention

    class DenseRef(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3 * 128, use_bias=False, name="qkv")(x)

    x = jnp.zeros((2, 10, 128))
    got = SelfAttention(dim=128, heads=4).init(
        {"params": jax.random.PRNGKey(42)}, x, False)["params"]
    ref = DenseRef().init({"params": jax.random.PRNGKey(42)}, x)["params"]
    assert set(got.keys()) >= {"qkv", "proj"}
    assert got["qkv"]["kernel"].shape == (128, 3 * 128)
    np.testing.assert_array_equal(np.asarray(got["qkv"]["kernel"]),
                                  np.asarray(ref["qkv"]["kernel"]))
    assert "bias" not in got["qkv"]


def test_dropout_requires_rng():
    qkv = _qkv(2, 8, 128)
    with pytest.raises(ValueError):
        self_attention_qkv(qkv, 4, dropout_rate=0.1, train=True)


def test_module_uses_kernel_only_on_tpu_train():
    """Off-TPU the SelfAttention module must trace the XLA path (the
    kernel gate mirrors WindowAttention's TPU/train gating)."""
    from gdl_tpu.models.transformer import SelfAttention

    m = SelfAttention(dim=128, heads=4, dropout_rate=0.1)
    x = jnp.zeros((2, 10, 128))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, False)
    # CPU backend: train=True still runs the XLA path (no pallas crash,
    # dropout active) — and eval is deterministic
    y = m.apply(variables, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
    z = m.apply(variables, x, False)
    assert y.shape == z.shape == (2, 10, 128)


@pytest.mark.parametrize("case", CASES)
def test_fused_eval_forward_matches_xla(case):
    """The residual-free eval entry (self_attention_fused_eval) == the
    XLA oracle on qkv = x @ W."""
    from gdl_tpu.ops.self_attention import self_attention_fused_eval

    b, n, heads, c = case["b"], case["n"], case["heads"], case["c"]
    x, w = _xw(b, n, c, seed=11)
    ours = self_attention_fused_eval(x, w, heads)
    ref = self_attention_xla((x @ w).reshape(b, n, 3, c), heads)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sa_kernel_supported_predicate():
    """Packed-head kernels require the head group to fill whole 128-lane
    tiles (g*d % 128 == 0). Unaligned configs used to reach Mosaic and
    die at COMPILE time with 'infer-vector-layout: unsupported shape
    cast' on the [.., 3, gd] -> [.., 3*gd] collapse (hit for real by
    tools/share_streams_ab.py's embed_dim=64 study model on TPU)."""
    from gdl_tpu.ops.self_attention import sa_kernel_supported

    # the shipping configs
    assert sa_kernel_supported(512, 8)    # mmformer: d=64, g=2
    assert sa_kernel_supported(1024, 32)  # swin stage 4: d=32, g=4
    assert sa_kernel_supported(128, 4)    # swin stage 1
    assert sa_kernel_supported(256, 2)    # d=128, g=1
    # unaligned: max g still leaves gd short of a lane tile
    assert not sa_kernel_supported(64, 8)    # gd = 64
    assert not sa_kernel_supported(192, 3)   # d=64, g=1 -> gd=64
    assert not sa_kernel_supported(96, 2)    # d=48: 128 % 48 != 0
    assert not sa_kernel_supported(80, 8)    # d=10: 128 % 10 != 0
    # degenerate
    assert not sa_kernel_supported(100, 3)   # dim % heads != 0
    assert not sa_kernel_supported(512, 2)   # d=256 > 128 lanes


def test_unaligned_heads_fall_back_to_xla_on_tpu(monkeypatch):
    """With the backend REPORTING tpu, an unaligned head config must
    take the XLA branch (not the pallas_call, which would fail Mosaic
    compilation); an aligned config must still pick the kernel. Traced
    on CPU by intercepting the gated entry points."""
    from gdl_tpu.models import transformer as tmod

    calls = []

    def fake_fused(x, kernel, heads, **kw):
        calls.append("fused")
        import gdl_tpu.ops.self_attention as sa
        qkv = (x @ kernel).reshape(x.shape[0], x.shape[1], 3, x.shape[2])
        return sa.self_attention_xla(qkv, heads)

    def fake_fused_eval(x, kernel, heads, **kw):
        calls.append("fused_eval")
        import gdl_tpu.ops.self_attention as sa
        qkv = (x @ kernel).reshape(x.shape[0], x.shape[1], 3, x.shape[2])
        return sa.self_attention_xla(qkv, heads)

    import gdl_tpu.ops.self_attention as sa
    monkeypatch.setattr(sa, "self_attention_fused", fake_fused)
    monkeypatch.setattr(sa, "self_attention_fused_eval", fake_fused_eval)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    for dim, heads, expect_kernel in ((64, 8, False), (128, 4, True)):
        m = tmod.SelfAttention(dim=dim, heads=heads)
        x = jnp.zeros((2, 10, dim))
        variables = m.init({"params": jax.random.PRNGKey(0)}, x, False)
        calls.clear()
        y = m.apply(variables, x, True)
        assert y.shape == (2, 10, dim)
        assert (calls == ["fused"]) is expect_kernel, (dim, heads, calls)
