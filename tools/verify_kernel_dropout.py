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
    print("PASS")


if __name__ == "__main__":
    main()
