"""Hardware verification for the in-kernel Mosaic-PRNG dropout path of
ops/self_attention.py (dropout_impl='kernel').

Run ON TPU (the Mosaic PRNG has no interpret lowering). Checks, at the
mmformer attention shape:
  1. keep-rate of the in-kernel mask ~= 1 - rate,
  2. forward == an XLA oracle applying the EXTRACTED in-kernel mask,
  3. grad == the oracle's grad (proves the backward kernel REGENERATES
     bit-identical mask bits from the same seed words),
  4. the mask is deterministic across separate kernel launches.

This is the reproducible form of the round-3 session check that found
the signed-compare bug (i32 prng_random_bits vs u32 threshold: measured
keep-rate 0.39 instead of 0.9).

Usage: python tools/verify_kernel_dropout.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gdl_tpu.ops.self_attention import (  # noqa: E402
    _fold_seed_words, _round_up, _sa_fwd)


def main():
    assert jax.default_backend() == "tpu", "run on TPU"
    b, n, heads, c, rate = 4, 52, 8, 512, 0.1
    d = c // heads
    g = max(1, min(heads, 128 // d))
    hg = heads // g
    n_pad = _round_up(n, 8)

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, n, 3, c)).astype(np.float32))
    qkvp = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    key = jax.random.PRNGKey(7)
    seed = _fold_seed_words(key)
    keep_thresh = min(int(round((1.0 - rate) * 2 ** 32)), 2 ** 32 - 1)
    static = (g, d, n, d ** -0.5, 2, keep_thresh, 1.0 / (1.0 - rate))

    # 1+4: extract the in-kernel mask twice via the emit_mask entry
    _, _, keep1 = _sa_fwd(static, qkvp, seed, emit_mask=True)
    out, _, keep2 = _sa_fwd(static, qkvp, seed, emit_mask=True)
    keep1, keep2 = np.asarray(keep1), np.asarray(keep2)
    assert (keep1 == keep2).all(), "mask not deterministic across launches"
    kr = keep1.mean()
    print(f"keep-rate {kr:.4f} (target {1 - rate})")
    assert abs(kr - (1 - rate)) < 0.01, "keep-rate off — signed compare?"

    # unpack [hg, b, g*Np, Np] -> [B, H, Np, Np] and build the oracle
    m = keep1.reshape(hg, b, g, n_pad, n_pad).transpose(1, 0, 2, 3, 4)
    m_bhnn = jnp.asarray(m.reshape(b, heads, n_pad, n_pad)[:, :, :n, :n]
                         / (1.0 - rate))

    def oracle(x):
        xq = x.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = xq[0], xq[1], xq[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * d ** -0.5, axis=-1) * m_bhnn
        o = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        return o.transpose(0, 2, 1, 3).reshape(b, n, c).astype(x.dtype)

    ref = oracle(qkv)
    fdiff = float(jnp.max(jnp.abs(out[:, :n] - ref)))
    print(f"forward max|diff| vs mask-oracle {fdiff:.3e}")
    assert fdiff < 2e-4

    # 3: gradient through the real custom-vjp entry
    from gdl_tpu.ops.self_attention import self_attention_qkv
    cot = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    gk = jax.grad(lambda x: jnp.sum(self_attention_qkv(
        x, heads, dropout_rate=rate, dropout_rng=key, train=True,
        dropout_impl="kernel") * cot))(qkv)
    gx = jax.grad(lambda x: jnp.sum(oracle(x) * cot))(qkv)
    gdiff = float(jnp.max(jnp.abs(gk - gx)))
    print(f"grad max|diff| vs mask-oracle {gdiff:.3e}")
    assert gdiff < 5e-4

    # 5: the fused-GEMM entry (self_attention_fused, the round-3c
    # default train path) in 'kernel' dropout mode. Both entries draw
    # mask bits as f(seed words, block position, draw shape, G); when
    # their block sizes agree (assert below — true at this shape) the
    # same mask applies, so fused(x, W) must equal qkv-entry(x @ W),
    # forward and grad — proving the fused forward AND the shared
    # backward regenerate identical bits through the real Mosaic PRNG.
    from gdl_tpu.ops.self_attention import (
        _pick_block_kernel_dropout, _xw_extra_row_bytes,
        self_attention_fused)
    g_qkv = _pick_block_kernel_dropout(b, n_pad, g)
    g_fused = _pick_block_kernel_dropout(
        b, n_pad, g, _xw_extra_row_bytes(n_pad, c, 128))
    assert g_qkv == g_fused, (
        f"block sizes diverged ({g_qkv} vs {g_fused}) — the cross-entry "
        "equality below would compare different masks; pick a smaller "
        "verification shape")
    w = jnp.asarray((rng.standard_normal((c, 3 * c)) / np.sqrt(c)
                     ).astype(np.float32))
    x_in = qkv.reshape(b, n, 3 * c)[:, :, :c]  # any [B,N,C] payload
    kw = dict(dropout_rate=rate, dropout_rng=key, train=True,
              dropout_impl="kernel")
    f1 = self_attention_fused(x_in, w, heads, **kw)
    f2 = self_attention_fused(x_in, w, heads, **kw)
    assert (np.asarray(f1) == np.asarray(f2)).all(), \
        "fused forward not deterministic across launches"
    qkv_of_x = (x_in @ w).reshape(b, n, 3, c)
    split = self_attention_qkv(qkv_of_x, heads, **kw)
    sdiff = float(jnp.max(jnp.abs(f1 - split)))
    print(f"fused-vs-qkv forward max|diff| (kernel dropout) {sdiff:.3e}")
    assert sdiff < 2e-4
    gf = jax.grad(lambda xx: jnp.sum(
        self_attention_fused(xx, w, heads, **kw) * cot))(x_in)
    gs = jax.grad(lambda xx: jnp.sum(self_attention_qkv(
        (xx @ w).reshape(b, n, 3, c), heads, **kw) * cot))(x_in)
    g2diff = float(jnp.max(jnp.abs(gf - gs)))
    print(f"fused-vs-qkv grad max|diff| (kernel dropout) {g2diff:.3e}")
    assert g2diff < 5e-4
    print("PASS")


if __name__ == "__main__":
    main()
