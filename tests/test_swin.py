"""Swin encoder: shape contract, shifted-window machinery, PE branch, and
XLA-vs-Pallas window-attention equality."""

import functools

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gdl_tpu.models.swin import (
    SwinTransformer,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
    window_shift,
)
from gdl_tpu.ops.window_attention import (
    window_attention_pallas,
    window_attention_pallas_packed,
    window_attention_pallas_qkv,
    window_attention_xla,
    window_attention_xla_packed,
)

TINY = dict(img_size=32, patch_size=4, embed_dim=16, depths=(1, 2),
            num_heads=(2, 4), window=4, drop_path_rate=0.1)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 4, 16, 3)
    back = window_reverse(wins, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))



@pytest.mark.parametrize("quadrant", [False, True])
def test_window_shift_matches_roll_plus_partition(quadrant, monkeypatch):
    """window_shift (the window-resident cyclic shift) against the
    reference construction: spatial roll then partition
    (swin_transformer.py:231-234), both directions — under both
    lowerings (sequential two-concat and quadrant single-pass; the
    flag only changes how XLA lowers the copies, outputs are
    bit-exact)."""
    import gdl_tpu.models.swin as _sm

    monkeypatch.setattr(_sm, "SHIFT_QUADRANT_LOWERING", quadrant)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 14, 14, 5)), jnp.float32)
    win, s = 7, 3
    xw = x.reshape(2, 2, win, 2, win, 5).transpose(0, 1, 3, 2, 4, 5)

    ref = window_partition(jnp.roll(x, (-s, -s), axis=(1, 2)), win)
    got = window_shift(xw, s).reshape(8, win * win, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    y = jnp.asarray(rng.standard_normal((2, 2, 2, win, win, 5)), jnp.float32)
    ref_sp = jnp.roll(window_reverse(y.reshape(8, win * win, 5), win, 14, 14),
                      (s, s), axis=(1, 2))
    ref_w = ref_sp.reshape(2, 2, win, 2, win, 5).transpose(0, 1, 3, 2, 4, 5)
    got_w = window_shift(y, s, inverse=True)
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(ref_w))


def test_window_resident_layout_bit_exact():
    """The window-resident stage layout is the SAME program as the spatial
    layout up to data movement — outputs must be bit-exact, eval and train
    (shared params; droppath rngs line up because mask element counts are
    identical)."""
    kw = dict(modality="audio", img_size=56, patch_size=4, embed_dim=16,
              depths=(2, 2), num_heads=(2, 4), window=7, drop_path_rate=0.1)
    m0 = SwinTransformer(**kw, window_resident=False)
    m1 = SwinTransformer(**kw, window_resident=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 1))
    p = m0.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    np.testing.assert_array_equal(
        np.asarray(m0.apply(p, x, train=False)),
        np.asarray(m1.apply(p, x, train=False)))

    rngs = {"droppath": jax.random.PRNGKey(2)}
    o0 = m0.apply(p, x, train=True, rngs=rngs)
    o1 = m1.apply(p, x, train=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    # visual modality (B·T fold) as well
    kwv = dict(kw, modality="visual")
    mv0 = SwinTransformer(**kwv, window_resident=False)
    mv1 = SwinTransformer(**kwv, window_resident=True)
    xv = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 56, 56, 3))
    pv = mv0.init({"params": jax.random.PRNGKey(0)}, xv, train=False)
    np.testing.assert_array_equal(
        np.asarray(mv0.apply(pv, xv, train=False)),
        np.asarray(mv1.apply(pv, xv, train=False)))


def test_relative_position_index_matches_torch_recipe():
    """Independent torch construction of the standard Swin index."""
    w = 7
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w),
                                        indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    ref = rel.sum(-1).numpy()
    np.testing.assert_array_equal(relative_position_index(w), ref)


def test_shift_mask_blocks_cross_boundary_attention():
    mask = shift_attn_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # the first (interior) window needs no masking
    assert np.all(mask[0] == 0.0)
    # boundary windows do
    assert (mask == -100.0).any()


def test_swin_audio_forward_shape():
    model = SwinTransformer(modality="audio", **TINY)
    x = jnp.ones((2, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    # 32/4 = 8 tokens/side, one merge → 4x4, dim 16*2
    assert out.shape == (2, 4, 4, 32)


def test_swin_visual_folds_time():
    model = SwinTransformer(modality="visual", **TINY)
    x = jnp.ones((2, 3, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (6, 4, 4, 32)


def test_swin_pe_branch_returns_sampled_mu_std():
    model = SwinTransformer(modality="audio", pe=True, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, mu, std = model.apply(variables, x, train=False)
    assert out.shape == (2, 32)
    assert mu.shape == (2, 4, 4, 32)
    assert std.shape == mu.shape
    assert np.all(np.asarray(std) > 0)
    # eval: out == pooled mu
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.mean(mu, axis=(1, 2))),
                               rtol=1e-5, atol=1e-6)
    # train: reparameterized sample differs from mu
    (out_t, _, _), _ = model.apply(
        variables, x, train=True,
        rngs={"droppath": jax.random.PRNGKey(2), "pe": jax.random.PRNGKey(3)},
        mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out_t), np.asarray(out))


def test_pallas_window_attention_matches_xla():
    rng = np.random.default_rng(0)
    b, h, n, d = 8, 4, 49, 32
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
    mask = jnp.asarray(shift_attn_mask(14, 14, 7, 3)[:4])  # nW=4 divides b=8

    ref = window_attention_xla(q, k, v, bias, mask)
    out = window_attention_pallas(q, k, v, bias, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)

    ref2 = window_attention_xla(q, k, v, bias, None)
    out2 = window_attention_pallas(q, k, v, bias, None)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=2e-4,
                               atol=2e-5)


def test_packed_attention_variants_match_xla():
    """The packed-head forms (XLA block-diag trick, Pallas packed kernel,
    and the qkv-direct kernel) against the plain XLA reference, across the
    Swin-B stage head counts and masked/unmasked."""
    rng = np.random.default_rng(1)
    n = 49
    for h, b, use_mask in ((4, 8, True), (8, 8, False), (32, 4, True)):
        d = 32
        c = h * d
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
        mask = jnp.asarray(shift_attn_mask(14, 14, 7, 3)[:4]) \
            if use_mask else None

        ref = np.asarray(window_attention_xla(q, k, v, bias, mask))
        for fn in (window_attention_xla_packed,
                   window_attention_pallas_packed):
            out = np.asarray(fn(q, k, v, bias, mask))
            np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5,
                                       err_msg=f"{fn.__name__} h={h}")

        # qkv-direct path: emulate the swin qkv projection layout
        qkv5 = jnp.stack([q, k, v], axis=2)            # [b, h, 3, n, d]
        qkv = qkv5.transpose(0, 3, 2, 1, 4).reshape(b, n, 3, c)
        ref_p = ref.transpose(0, 2, 1, 3).reshape(b, n, c)
        for save_p, transposed in ((False, False), (True, False),
                                   (True, True)):
            out = np.asarray(window_attention_pallas_qkv(
                qkv, bias, mask, h, save_p=save_p, transposed=transposed))
            np.testing.assert_allclose(
                out, ref_p, rtol=2e-4, atol=2e-5,
                err_msg=f"qkv-direct h={h} save_p={save_p} t={transposed}")


@pytest.mark.parametrize("bwd_delta", [False, True],
                         ids=["inkernel_dsum", "delta_trick"])
def test_qkv_attention_savep_gradients_match_xla(bwd_delta, monkeypatch):
    """The residual-p backward kernel (softmax saved in the forward, no
    recompute) against XLA autodiff of the same function — dqkv and dbias.
    Parametrized over the delta-trick backward (Σ_k dp·p precomputed as
    dout·out outside the kernel — the flash-attention identity) and the
    legacy in-kernel score-sized reduction."""
    import gdl_tpu.ops.window_attention as wa_mod

    monkeypatch.setattr(wa_mod, "BWD_DELTA", bwd_delta)
    jax.clear_caches()
    rng = np.random.default_rng(5)
    n = 49
    for h, b, use_mask in ((4, 8, True), (8, 8, False)):
        d = 32
        c = h * d
        q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)),
                               jnp.float32) for _ in range(3))
        bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
        mask = jnp.asarray(shift_attn_mask(14, 14, 7, 3)[:4]) \
            if use_mask else None
        qkv = jnp.stack([q, k, v], axis=2).transpose(0, 3, 2, 1, 4)
        qkv = qkv.reshape(b, n, 3, c)

        def loss_pallas(qkv, bias, save_p, transposed):
            o = window_attention_pallas_qkv(qkv, bias, mask, h,
                                            save_p=save_p,
                                            transposed=transposed)
            return jnp.sum(jnp.sin(o))

        def loss_xla(qkv, bias):
            q5 = qkv.reshape(b, n, 3, h, d)
            qq, kk, vv = (q5[:, :, i].transpose(0, 2, 1, 3)
                          for i in range(3))
            o = window_attention_xla(qq, kk, vv, bias, mask)
            return jnp.sum(jnp.sin(o.transpose(0, 2, 1, 3).reshape(b, n, c)))

        ref = jax.grad(loss_xla, argnums=(0, 1))(qkv, bias)
        for save_p, transposed in ((False, False), (True, False),
                                   (True, True)):
            got = jax.grad(functools.partial(loss_pallas, save_p=save_p,
                                             transposed=transposed),
                           argnums=(0, 1))(qkv, bias)
            for a, r, nm in zip(got, ref, ("dqkv", "dbias")):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(r), rtol=5e-4, atol=5e-5,
                    err_msg=f"h={h} {nm} save_p={save_p} t={transposed}")


def test_qkv_attention_prepadded_entry_matches_unpadded():
    """The pre-padded entry (n_valid=N, qkv already [B, Np, 3, C] — the
    model pads the token stream BEFORE the qkv projection so the GEMM
    writes the kernel operand directly) must agree with the internal-pad
    entry on valid rows, forward AND gradients, with GARBAGE in the pad
    rows — padded keys are masked by the -1e30 bias columns, padded-query
    outputs are sliced, and their incoming cotangent is zero."""
    rng = np.random.default_rng(11)
    n, d = 49, 32
    for h, b, use_mask in ((4, 8, True), (8, 8, False)):
        c = h * d
        n_pad = -(-n // 8) * 8
        qkv = jnp.asarray(rng.standard_normal((b, n, 3, c)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
        mask = jnp.asarray(shift_attn_mask(14, 14, 7, 3)[:4]) \
            if use_mask else None
        garbage = jnp.asarray(
            rng.standard_normal((b, n_pad - n, 3, c)) * 50.0, jnp.float32)
        qkv_p = jnp.concatenate([qkv, garbage], axis=1)

        for save_p, transposed in ((False, False), (True, False),
                                   (True, True)):
            def f_ref(qkv, bias):
                o = window_attention_pallas_qkv(
                    qkv, bias, mask, h, save_p=save_p, transposed=transposed)
                return jnp.sum(jnp.sin(o))

            def f_pre(qkv_p, bias):
                o = window_attention_pallas_qkv(
                    qkv_p, bias, mask, h, save_p=save_p,
                    transposed=transposed, n_valid=n)
                return jnp.sum(jnp.sin(o))

            ref_v, ref_g = jax.value_and_grad(f_ref, argnums=(0, 1))(
                qkv, bias)
            got_v, got_g = jax.value_and_grad(f_pre, argnums=(0, 1))(
                qkv_p, bias)
            np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                                       rtol=1e-5,
                                       err_msg=f"fwd h={h} {save_p} "
                                               f"{transposed}")
            np.testing.assert_allclose(
                np.asarray(got_g[0][:, :n]), np.asarray(ref_g[0]),
                rtol=5e-5, atol=5e-6,
                err_msg=f"dqkv h={h} {save_p} {transposed}")
            # pad-row gradients must be exactly zero (they feed the qkv
            # Dense backward: any nonzero here would corrupt dW/db)
            assert float(jnp.abs(got_g[0][:, n:]).max()) == 0.0
            np.testing.assert_allclose(
                np.asarray(got_g[1]), np.asarray(ref_g[1]),
                rtol=5e-5, atol=5e-6,
                err_msg=f"dbias h={h} {save_p} {transposed}")



@pytest.mark.parametrize(
    "fused_bwd,bwd_delta",
    [(False, True), (False, False), (True, True), ("auto", True)],
    ids=["phase1_split_delta", "phase1_split_dsum", "phase2_fused_bwd",
         "auto_bwd"])
def test_fused_qkv_entry_matches_xla_composition(fused_bwd, bwd_delta,
                                                 monkeypatch):
    """window_attention_pallas_qkv_fused (qkv projection GEMM inside the
    forward kernel) against the XLA composition Dense -> attention:
    forward and every gradient (dx, dW, db, dbias) at fp32 tolerance,
    with GARBAGE pad rows in x (pad keys masked by the -1e30 bias
    columns; pad-row dx must be exactly zero so nothing upstream sees
    them). Runs both backward modes: the phase-1 split (attention bwd
    kernel + XLA projection GEMMs) and the phase-2 fully-fused backward
    (projection bwd inside the kernel, dqkv never reaches HBM)."""
    import gdl_tpu.ops.window_attention as wa_mod
    from gdl_tpu.ops.window_attention import (
        window_attention_pallas_qkv_fused,
    )

    monkeypatch.setattr(wa_mod, "FUSED_PROJECTION_BACKWARD", fused_bwd)
    monkeypatch.setattr(wa_mod, "BWD_DELTA", bwd_delta)
    # the entry is @jax.jit-cached and the gate is read at TRACE time —
    # without this the second parametrization would reuse the first's
    # compiled backward and never exercise its own gate value
    jax.clear_caches()

    rng = np.random.default_rng(17)
    n, d = 49, 32
    n_pad = -(-n // 8) * 8
    for h, b, use_mask in ((4, 8, True), (8, 8, False)):
        c = h * d
        x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        garbage = jnp.asarray(
            rng.standard_normal((b, n_pad - n, c)) * 50.0, jnp.float32)
        xp = jnp.concatenate([x, garbage], axis=1)
        w = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05,
                        jnp.float32)
        bvec = jnp.asarray(rng.standard_normal((3 * c,)) * 0.1,
                           jnp.float32)
        bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1,
                           jnp.float32)
        mask = jnp.asarray(shift_attn_mask(14, 14, 7, 3)[:4]) \
            if use_mask else None

        def f_fused(xp, w, bvec, bias):
            o = window_attention_pallas_qkv_fused(xp, w, bvec, bias, mask,
                                                  h, n_valid=n)
            return jnp.sum(jnp.sin(o))

        def f_ref(x, w, bvec, bias):
            qkv = (x @ w + bvec).reshape(b, n, 3, h, d)
            qq, kk, vv = (qkv[:, :, i].transpose(0, 2, 1, 3)
                          for i in range(3))
            o = window_attention_xla(qq, kk, vv, bias, mask)
            return jnp.sum(jnp.sin(
                o.transpose(0, 2, 1, 3).reshape(b, n, c)))

        ref_v, ref_g = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3))(
            x, w, bvec, bias)
        got_v, got_g = jax.value_and_grad(f_fused, argnums=(0, 1, 2, 3))(
            xp, w, bvec, bias)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                                   rtol=1e-4, err_msg=f"fwd h={h}")
        np.testing.assert_allclose(
            np.asarray(got_g[0][:, :n]), np.asarray(ref_g[0]),
            rtol=5e-4, atol=5e-5, err_msg=f"dx h={h}")
        assert float(jnp.abs(got_g[0][:, n:]).max()) == 0.0, h
        for gi, nm, tol in ((1, "dW", 5e-4), (2, "db", 5e-4),
                            (3, "dbias", 5e-4)):
            np.testing.assert_allclose(
                np.asarray(got_g[gi]), np.asarray(ref_g[gi]),
                rtol=tol, atol=5e-5, err_msg=f"{nm} h={h}")


def test_fused_qkv_keep_pad_equivalence():
    """keep_pad=True (the PROJ_BOUNDARY='pad56' lowering: the projection
    GEMM consumes the padded kernel output and the slice moves after it)
    must be value- and gradient-equivalent to the default sliced return:
    valid rows bitwise-identical forward, identical grads through a
    consumer that slices to the valid tokens."""
    from gdl_tpu.ops.window_attention import (
        window_attention_pallas_qkv_fused,
    )

    rng = np.random.default_rng(23)
    n, d, h, b = 49, 32, 4, 8
    n_pad = -(-n // 8) * 8
    c = h * d
    xp = jnp.asarray(rng.standard_normal((b, n_pad, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.float32)
    bvec = jnp.asarray(rng.standard_normal((3 * c,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
    mask = jnp.asarray(shift_attn_mask(14, 14, 7, 3)[:4])
    wp = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)

    def f(xp, w, wp, keep_pad):
        o = window_attention_pallas_qkv_fused(xp, w, bvec, bias, mask, h,
                                              n_valid=n, keep_pad=keep_pad)
        o = (o @ wp)[:, :n] if keep_pad else (o @ wp)  # proj, slice after
        return jnp.sum(jnp.sin(o)), o

    (v0, o0), g0 = jax.value_and_grad(
        lambda *a: f(*a, keep_pad=False), argnums=(0, 1, 2),
        has_aux=True)(xp, w, wp)
    (v1, o1), g1 = jax.value_and_grad(
        lambda *a: f(*a, keep_pad=True), argnums=(0, 1, 2),
        has_aux=True)(xp, w, wp)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, e, nm in zip(g1, g0, ("dx", "dW", "dWp")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-6, err_msg=nm)


def test_fused_qkv_param_tree_and_init_match_dense():
    """_QkvParams must create EXACTLY the params the flax Dense path
    creates — same tree, same shapes, same init values under the same
    RNG — so fuse_qkv_gemm never changes checkpoints or torch interop."""
    from flax import linen as nn

    from gdl_tpu.models.swin import _QkvParams, _dense

    class ViaDense(nn.Module):
        @nn.compact
        def __call__(self, x):
            return _dense(24, jnp.float32, "qkv")(x)

    class ViaParams(nn.Module):
        @nn.compact
        def __call__(self, x):
            kernel, bias = _QkvParams(24, name="qkv")(x.shape[-1])
            return x @ kernel + bias

    x = jnp.zeros((2, 8))
    p1 = ViaDense().init(jax.random.PRNGKey(3), x)["params"]
    p2 = ViaParams().init(jax.random.PRNGKey(3), x)["params"]
    assert jax.tree_util.tree_structure(p1) == \
        jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_pallas_branch_integration_cpu(monkeypatch):
    """Drive the MODEL's Pallas training branch on CPU (is_tpu_backend
    patched True; the ops still see the real backend and run interpret
    mode) — covers the WindowAttention fused-qkv plumbing (_QkvParams,
    dtype promote, pre-pad, n_valid) that the backend gate otherwise
    hides from the CPU suite. Forward and parameter gradients must match
    the XLA branch at fp32 tolerance; param trees must be identical."""
    import gdl_tpu.models.swin as swin_mod

    monkeypatch.setattr(swin_mod, "is_tpu_backend", lambda: True)

    # embed 128 / heads 4 = the real Swin-B stage-1 head config (d=32,
    # g=4 -> gd=128): the smallest config sa_kernel_supported admits —
    # tiny widths like 32x2 fall back to XLA by design (a sub-128-lane
    # head group cannot lower on Mosaic). img 28 keeps interpret-mode
    # cost down (one 7x7 window).
    kw = dict(modality="visual", img_size=28, patch_size=4, embed_dim=128,
              depths=(2,), num_heads=(4,), window=7, drop_path_rate=0.0,
              window_resident=True)
    m_pal = SwinTransformer(use_pallas_attn=True, fuse_qkv_gemm=True,
                            **kw)
    m_xla = SwinTransformer(use_pallas_attn=False, **kw)

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((1, 1, 28, 28, 3)), jnp.float32)
    v_pal = m_pal.init({"params": jax.random.PRNGKey(9)}, x, train=True)
    v_xla = m_xla.init({"params": jax.random.PRNGKey(9)}, x, train=True)
    assert jax.tree_util.tree_structure(v_pal["params"]) == \
        jax.tree_util.tree_structure(v_xla["params"])
    for a, b in zip(jax.tree.leaves(v_pal["params"]),
                    jax.tree.leaves(v_xla["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(model, params):
        return jnp.sum(jnp.sin(model.apply({"params": params}, x,
                                           train=True)))

    l_pal, g_pal = jax.value_and_grad(
        functools.partial(loss, m_pal))(v_pal["params"])
    l_xla, g_xla = jax.value_and_grad(
        functools.partial(loss, m_xla))(v_xla["params"])
    np.testing.assert_allclose(float(l_pal), float(l_xla), rtol=1e-5)
    flat_p = jax.tree_util.tree_flatten_with_path(g_pal)[0]
    flat_x = jax.tree.leaves(g_xla)
    for (path, a), b in zip(flat_p, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_model_pallas_eval_branch_integration_cpu(monkeypatch):
    """Same backend-gate patching for the EVAL forward-only fused kernel
    (pallas_attn_eval): the model's eval forward through
    window_attention_pallas_qkv_fused_eval must match the XLA eval
    branch at fp32 tolerance (no gradients — the eval kernel registers
    no vjp and callers gate it to inference)."""
    import gdl_tpu.models.swin as swin_mod

    monkeypatch.setattr(swin_mod, "is_tpu_backend", lambda: True)

    # embed 128 / heads 4 = the real Swin-B stage-1 head config (d=32,
    # g=4 -> gd=128): the smallest config sa_kernel_supported admits —
    # tiny widths like 32x2 fall back to XLA by design (a sub-128-lane
    # head group cannot lower on Mosaic). img 28 keeps interpret-mode
    # cost down (one 7x7 window).
    kw = dict(modality="visual", img_size=28, patch_size=4, embed_dim=128,
              depths=(2,), num_heads=(4,), window=7, drop_path_rate=0.0,
              window_resident=True)
    m_ev = SwinTransformer(use_pallas_attn=True, fuse_qkv_gemm=True,
                           pallas_attn_eval=True, **kw)
    m_xla = SwinTransformer(use_pallas_attn=False, **kw)

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal((1, 1, 28, 28, 3)), jnp.float32)
    v_ev = m_ev.init({"params": jax.random.PRNGKey(11)}, x, train=False)
    v_xla = m_xla.init({"params": jax.random.PRNGKey(11)}, x, train=False)
    assert jax.tree_util.tree_structure(v_ev["params"]) == \
        jax.tree_util.tree_structure(v_xla["params"])

    o_ev = m_ev.apply(v_ev, x, train=False)
    o_xla = m_xla.apply(v_xla, x, train=False)
    np.testing.assert_allclose(np.asarray(o_ev), np.asarray(o_xla),
                               rtol=1e-4, atol=1e-5)


def test_unaligned_head_config_falls_back_to_xla(monkeypatch):
    """A WindowAttention config whose packed head group can't fill a
    128-lane tile (e.g. dim 32, 2 heads -> gd 64... <128) must take the
    XLA branch on TPU — train AND eval — instead of handing Mosaic a
    kernel it cannot compile ('infer-vector-layout: unsupported shape
    cast', hit for real on hardware during round 4). The pallas entry
    points are replaced with tripwires; the XLA path must be the one
    traced."""
    import gdl_tpu.models.swin as swin_mod
    import gdl_tpu.ops.window_attention as wa

    monkeypatch.setattr(swin_mod, "is_tpu_backend", lambda: True)
    for name in ("window_attention_pallas_qkv_fused",
                 "window_attention_pallas_qkv",
                 "window_attention_pallas_qkv_fused_eval"):
        monkeypatch.setattr(
            wa, name,
            lambda *a, _n=name, **k: (_ for _ in ()).throw(
                AssertionError(f"{_n} chosen for an unaligned config")))

    kw = dict(modality="visual", img_size=28, patch_size=4, embed_dim=32,
              depths=(2,), num_heads=(2,), window=7, drop_path_rate=0.0,
              window_resident=True)
    m = SwinTransformer(use_pallas_attn=True, fuse_qkv_gemm=True,
                        pallas_attn_eval=True, **kw)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((1, 1, 28, 28, 3)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(3)}, x, train=True)
    g = jax.grad(lambda p: jnp.sum(jnp.sin(
        m.apply({"params": p}, x, train=True))))(v["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
    out = m.apply(v, x, train=False)
    assert np.isfinite(np.asarray(out)).all()
