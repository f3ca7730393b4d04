"""Fused self-attention Pallas kernel for the mmformer transformer stack.

The XLA lowering of `SelfAttention` (models/transformer.py — the reference
lib's Transformer.py:17-51) materializes the [B, H, N, D] head split, a
score-sized softmax, a score-sized dropout mask, and two head transposes
per call — profiled at a third of the mmformer train step
(benchmarks/RESULTS.md round 3). This kernel consumes the qkv projection
output DIRECTLY in its natural [B, N, 3, C] layout (column order
[3, H, dh], so each head-group's g*dh = 128 lanes are contiguous — the
same lane-blocked addressing as ops/window_attention.py, no transpose in
HBM), computes softmax(q k^T * scale) with attention-probability dropout
FUSED, and returns [B, N, C].

Dropout design, two implementations:

'hbm' — the {0, 1/(1-rate)} mask is generated OUTSIDE the kernel by one
XLA RngBitGenerator op (cfg.fast_dropout_rng's 'rbg' keys make this a
single fused op) in the kernel's packed layout, and the SAME array feeds
the backward kernel as a residual — bitwise-deterministic backward, no
in-kernel PRNG state, and the interpret-mode CPU fallback stays exact.

'kernel' — the mask bits are generated INSIDE the kernel by the Mosaic
PRNG (pltpu.prng_seed + prng_random_bits, seeded per grid block from two
words folded out of the dropout key) and REGENERATED identically in the
backward kernel — verified on v5e: the bit stream is a deterministic
function of (seed words, draw shape) only, identical across different
kernel programs. Nothing score-sized ever reaches HBM for dropout: at
mmformer shapes the 'hbm' path materializes a 315 MB u32 rbg output, a
315 MB layout copy ({2,3,1,0}→{3,2,1,0} — XLA prefers the less-padded
lane dim for the rbg, the kernel needs row-major), a 157 MB bf16 mask,
plus fwd+bwd mask reads, PER fusion pass — ~10% of the profiled step.
Mask bits differ from 'hbm' (different PRNG); the keep probability is
exact to 2^-32 — the same implementation-defined-bits class of change as
cfg.fast_dropout_rng. Both backwards are bitwise-deterministic.

Backward is a second Pallas kernel from the saved softmax residual
(save-p, the round-2 window-attention lever): no score recompute; dv/dp
ride the same block-diagonal packing so every dot contracts the full
gd=128 MXU depth.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _blockmask(g: int, d: int, gd: int, dtype):
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    return (col_head == row_head).astype(dtype)  # [g, gd]


def _seed_block_prng(seed_ref):
    """Seed the per-core Mosaic PRNG from the two key words + the grid
    position (prng_seed takes at most 2 words on this toolchain — mix
    the block position in with golden-ratio odd constants so distinct
    blocks draw distinct streams; fwd and bwd kernels at the same block
    re-derive the SAME stream). All dropout-carrying kernels must share
    the (hg, b//G) grid orientation for the streams to agree."""
    hi, i = pl.program_id(0), pl.program_id(1)
    s0 = seed_ref[0] ^ (hi * jnp.int32(-1640531527))
    s1 = seed_ref[1] ^ (i * jnp.int32(-2048144789)
                        + hi * jnp.int32(1013904223))
    pltpu.prng_seed(s0, s1)


def _kernel_keep_mask(seed_ref, shape, keep_thresh):
    """Regenerable {0,1} keep mask: u32 stream < thresh (keep prob exact
    to 2^-32). f32 so the caller folds in the 1/(1-rate) scale.
    prng_random_bits yields i32 — bitcast to u32 or the comparison goes
    SIGNED (measured keep-rate 0.39 instead of 0.9)."""
    _seed_block_prng(seed_ref)
    bits = pltpu.prng_random_bits(shape)
    ubits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    return (ubits < jnp.uint32(keep_thresh)).astype(jnp.float32)


def _sa_attn_tail(q, k, v, *, g, d, n_valid, dropout_mode, keep_thresh,
                  inv_keep, mask_ref, seed_ref, m_out_ref, o_ref, p_ref):
    """Shared attention body (post-qkv): block-diagonal packed-head
    softmax(q k^T) with fused attention-prob dropout. q arrives
    PRE-SCALED. Used by both the qkv-input kernel and the fused-GEMM
    kernel so the two entries stay bitwise-identical past the
    projection."""
    G, np_, gd = q.shape
    bm = _blockmask(g, d, gd, q.dtype)

    q_bd = (q[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    s = jax.lax.dot_general(
        q_bd, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, Np]
    if n_valid < np_:  # static: padded keys never receive weight; the
        # unpadded shapes (inter N=392) skip the iota/where passes
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p_ref[0] = p.astype(p_ref.dtype)
    if dropout_mode == 1:
        p = p * mask_ref[0].astype(jnp.float32)
    elif dropout_mode == 2:
        keep = _kernel_keep_mask(seed_ref, p.shape, keep_thresh)
        if m_out_ref is not None:
            m_out_ref[0] = keep.astype(m_out_ref.dtype)
        p = p * (keep * jnp.float32(inv_keep))
    out_full = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, gd]
    out = jnp.sum(out_full.reshape(G, g, np_, gd)
                  * bm[None, :, None, :].astype(jnp.float32), axis=1)
    o_ref[...] = out.astype(o_ref.dtype)


def _sa_fwd_kernel(qkv_ref, *refs, g, d, n_valid, scale, dropout_mode,
                   keep_thresh=0, inv_keep=1.0, emit_mask=False):
    """One grid step: G batch rows of ONE head-group.

    blocks: qkv [G, Np, 3, gd]; o [G, Np, gd]; p residual
    [1, G, g*Np, Np] (PRE-dropout softmax). dropout_mode: 0 none;
    1 'hbm' — a [1, G, g*Np, Np] {0, 1/(1-rate)} mask input precedes o;
    2 'kernel' — a (2,) SMEM seed input precedes o and the mask is
    Mosaic-PRNG-generated in place (emit_mask additionally writes the
    {0,1} keep mask after p — the verification entry)."""
    mask_ref = seed_ref = m_out_ref = None
    if dropout_mode == 1:
        mask_ref, o_ref, p_ref = refs
    elif dropout_mode == 2:
        if emit_mask:
            seed_ref, o_ref, p_ref, m_out_ref = refs
        else:
            seed_ref, o_ref, p_ref = refs
    else:
        o_ref, p_ref = refs
    q = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    _sa_attn_tail(q, k, v, g=g, d=d, n_valid=n_valid,
                  dropout_mode=dropout_mode, keep_thresh=keep_thresh,
                  inv_keep=inv_keep, mask_ref=mask_ref, seed_ref=seed_ref,
                  m_out_ref=m_out_ref, o_ref=o_ref, p_ref=p_ref)


def _sa_xw_fwd_kernel(x_ref, w_ref, *refs, g, d, n_valid, scale,
                      dropout_mode, keep_thresh=0, inv_keep=1.0):
    """Fused-GEMM forward: the qkv projection runs IN-KERNEL (the swin
    round-3b lever, ops/window_attention.py _wa_xw_t_savep_kernel) so the
    [B, N, 3C] Dense output never round-trips HBM in XLA's GEMM layout —
    the profiled mmformer step spent 4.6 ms/step of reshapes + 1.4 ms of
    copies converting it to the kernel's [B, N, 3, C] T(4,128) tiling.

    blocks: x [G, Np, C]; w [C, 3, gd] (one head-group's columns of the
    Dense kernel reshaped [C, 3, HG*gd] — column order already [3,H,dh]);
    outputs o / p as in _sa_fwd_kernel plus the qkv residual block
    [G, Np, 3, gd] (kernel-produced, so the backward kernel reads it
    copy-free in its own layout)."""
    mask_ref = seed_ref = None
    if dropout_mode == 1:
        mask_ref, o_ref, p_ref, qkv_ref = refs
    elif dropout_mode == 2:
        seed_ref, o_ref, p_ref, qkv_ref = refs
    else:
        o_ref, p_ref, qkv_ref = refs
    G, np_, c = x_ref.shape
    gd = w_ref.shape[2]
    qkv = jax.lax.dot_general(
        x_ref[...].reshape(G * np_, c), w_ref[...].reshape(c, 3 * gd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv.reshape(G, np_, 3, gd).astype(qkv_ref.dtype)
    qkv_ref[...] = qkv
    q = qkv[:, :, 0, :] * jnp.asarray(scale, qkv.dtype)
    k = qkv[:, :, 1, :]
    v = qkv[:, :, 2, :]
    _sa_attn_tail(q, k, v, g=g, d=d, n_valid=n_valid,
                  dropout_mode=dropout_mode, keep_thresh=keep_thresh,
                  inv_keep=inv_keep, mask_ref=mask_ref, seed_ref=seed_ref,
                  m_out_ref=None, o_ref=o_ref, p_ref=p_ref)


def _sa_bwd_kernel(qkv_ref, p_ref, *refs, g, d, scale, dropout_mode,
                   keep_thresh=0, inv_keep=1.0):
    """Backward from the saved PRE-dropout softmax p + the same mask
    (read back in 'hbm' mode, PRNG-regenerated in 'kernel' mode)."""
    mask_ref = seed_ref = None
    if dropout_mode == 1:
        mask_ref, dout_ref, dqkv_ref = refs
    elif dropout_mode == 2:
        seed_ref, dout_ref, dqkv_ref = refs
    else:
        dout_ref, dqkv_ref = refs
    qs = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    p = p_ref[0].astype(jnp.float32)  # [G, g*Np, Np]
    dout = dout_ref[...]  # [G, Np, gd]
    G, np_, gd = qs.shape
    bm = _blockmask(g, d, gd, qs.dtype)

    if dropout_mode == 1:
        m = mask_ref[0].astype(jnp.float32)
        p_d = p * m
    elif dropout_mode == 2:
        # SAME bits as the forward drew: same seed words, same block
        # position, same draw shape (hardware-verified deterministic
        # across kernel programs)
        m = _kernel_keep_mask(seed_ref, p.shape,
                              keep_thresh) * jnp.float32(inv_keep)
        p_d = p * m
    else:
        p_d = p

    dout_bd = (dout[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    # dv[j, c@h] = sum_i p_d[(h,i), j] * dout_bd[(h,i), c]
    dv = jax.lax.dot_general(
        p_d.astype(dout.dtype), dout_bd,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np, gd]
    # dp_d[(h,i), j] = dout_h[i] . v_h[j]; chain through the dropout mask
    dp = jax.lax.dot_general(
        dout_bd, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, Np]
    if dropout_mode:
        dp = dp * m
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # fp32

    dq_full = jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, gd]
    dq = jnp.sum(dq_full.reshape(G, g, np_, gd)
                 * bm[None, :, None, :].astype(jnp.float32),
                 axis=1) * scale
    dk = jax.lax.dot_general(
        ds.astype(qs.dtype), (qs[:, None, :, :] * bm[None, :, None, :]
                              ).reshape(G, g * np_, gd),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np, gd]

    dqkv_ref[:, :, 0, :] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 1, :] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 2, :] = dv.astype(dqkv_ref.dtype)


def _specs(G, n_pad, g, gd):
    return dict(
        qkv=pl.BlockSpec((G, n_pad, 3, gd), lambda hi, i: (i, 0, 0, hi),
                         memory_space=pltpu.VMEM),
        score=pl.BlockSpec((1, G, g * n_pad, n_pad),
                           lambda hi, i: (hi, i, 0, 0),
                           memory_space=pltpu.VMEM),
        out=pl.BlockSpec((G, n_pad, gd), lambda hi, i: (i, 0, hi),
                         memory_space=pltpu.VMEM),
    )


def _pick_block(b: int, n_pad: int, g: int, backward: bool,
                kernel_dropout: bool = False,
                extra_row_bytes: int = 0) -> int:
    """Largest G dividing b whose Mosaic stack stays under the 16 MB
    scoped-vmem limit. MEASURED (v5e, Np=200, g=2): the forward kernel's
    stack is ~2.54 MB per batch row — ≈8 score-sized f32 arrays live
    (s, p, the iota/where temps, softmax max/sum broadcasts, and the
    dot operand copies), far above the naive s+p count; G=8 OOMs by
    4.35 MB, G=4 fits. The backward holds p/dp/ds plus the same temps —
    budget it ~25% more. In-kernel PRNG dropout adds the u32 bits draw
    + the f32 keep mask (~2 more score-sized arrays). extra_row_bytes
    accounts the fused-GEMM entry's non-score residents (the x block,
    the f32 qkv dot result + its bf16 copy) per batch row."""
    live = 10 if backward else 8
    if kernel_dropout:
        live += 2
    budget = 13 * 2 ** 20
    per_row = g * n_pad * n_pad * 4 * live + extra_row_bytes
    G = max(1, budget // per_row)
    while b % G:
        G -= 1
    return G


def _pick_block_kernel_dropout(b: int, n_pad: int, g: int,
                               extra_row_bytes: int = 0) -> int:
    """'kernel' dropout needs fwd and bwd to draw the SAME per-block bit
    stream, so both use one (the more constrained, backward) block size."""
    return min(_pick_block(b, n_pad, g, backward=False, kernel_dropout=True,
                           extra_row_bytes=extra_row_bytes),
               _pick_block(b, n_pad, g, backward=True, kernel_dropout=True))


def _xw_extra_row_bytes(n_pad: int, c: int, gd: int) -> int:
    """Fused-GEMM forward per-row VMEM extras: the x block (input dtype,
    <=2B), the f32 qkv dot result and its low-precision copy."""
    return n_pad * c * 2 + n_pad * 3 * gd * (4 + 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sa_core(static, qkvp, maskp):
    return _sa_fwd(static, qkvp, maskp)[0]


def _sa_fwd(static, qkvp, maskp, emit_mask=False):
    g, d, n_valid, scale, dropout_mode, keep_thresh, inv_keep = static
    b, n_pad, _, c = qkvp.shape
    gd = g * d
    hg = c // gd
    if dropout_mode == 2:
        G = _pick_block_kernel_dropout(b, n_pad, g)
    else:
        G = _pick_block(b, n_pad, g, backward=False)
    specs = _specs(G, n_pad, g, gd)
    in_specs = [specs["qkv"]]
    args = [qkvp]
    if dropout_mode == 1:
        in_specs.append(specs["score"])
        args.append(maskp)
    elif dropout_mode == 2:  # maskp is the (2,) i32 seed words
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(maskp)
    out_specs = [specs["out"], specs["score"]]
    out_shape = [
        jax.ShapeDtypeStruct((b, n_pad, hg * gd), qkvp.dtype),
        jax.ShapeDtypeStruct((hg, b, g * n_pad, n_pad), qkvp.dtype),
    ]
    if emit_mask:  # verification entry: also write the {0,1} keep mask
        out_specs.append(specs["score"])
        out_shape.append(
            jax.ShapeDtypeStruct((hg, b, g * n_pad, n_pad), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_sa_fwd_kernel, g=g, d=d, n_valid=n_valid,
                          scale=scale, dropout_mode=dropout_mode,
                          keep_thresh=keep_thresh, inv_keep=inv_keep,
                          emit_mask=emit_mask),
        grid=(hg, b // G),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(*args)
    if emit_mask:
        out, p, keep = outs
        return out, (qkvp, p, maskp), keep
    out, p = outs
    return out, (qkvp, p, maskp)


def _dqkv_pallas(static, qkvp, p, maskp, dout, G):
    """Run the shared backward kernel (dqkv from the save-p residual) at
    block size G — used by both the qkv-input and fused-GEMM cores."""
    g, d, n_valid, scale, dropout_mode, keep_thresh, inv_keep = static
    b, n_pad, _, c = qkvp.shape
    gd = g * d
    hg = c // gd
    specs = _specs(G, n_pad, g, gd)
    in_specs = [specs["qkv"], specs["score"]]
    args = [qkvp, p]
    if dropout_mode == 1:
        in_specs.append(specs["score"])
        args.append(maskp)
    elif dropout_mode == 2:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(maskp)
    in_specs.append(specs["out"])
    args.append(dout)
    return pl.pallas_call(
        functools.partial(_sa_bwd_kernel, g=g, d=d, scale=scale,
                          dropout_mode=dropout_mode,
                          keep_thresh=keep_thresh, inv_keep=inv_keep),
        grid=(hg, b // G),
        in_specs=in_specs,
        out_specs=specs["qkv"],
        out_shape=jax.ShapeDtypeStruct(qkvp.shape, qkvp.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _sa_bwd(static, res, dout):
    g, d, n_valid, scale, dropout_mode, keep_thresh, inv_keep = static
    qkvp, p, maskp = res
    b, n_pad, _, _ = qkvp.shape
    if dropout_mode == 2:
        G = _pick_block_kernel_dropout(b, n_pad, g)
    else:
        G = _pick_block(b, n_pad, g, backward=True)
    dqkvp = _dqkv_pallas(static, qkvp, p, maskp, dout, G)
    return dqkvp, jnp.zeros_like(maskp)


_sa_core.defvjp(_sa_fwd, _sa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sa_xw_core(static, xp, w3, maskp):
    """Fused-GEMM core: xp [B, Np, C] (row-padded input), w3 the qkv
    Dense kernel reshaped [C, 3, HG*gd] (column order already [3,H,dh]).
    The forward kernel computes qkv in-VMEM and emits it as a residual
    in its own layout; the backward runs the shared dqkv kernel on that
    residual copy-free, then dx/dW are plain XLA GEMMs (the swin
    round-3b phase-1 split — fusing them in was a measured LOSS there,
    benchmarks/RESULTS.md)."""
    return _sa_xw_fwd(static, xp, w3, maskp)[0]


def _sa_xw_fwd(static, xp, w3, maskp):
    g, d, n_valid, scale, dropout_mode, keep_thresh, inv_keep = static
    b, n_pad, c = xp.shape
    gd = g * d
    hg = w3.shape[2] // gd
    extra = _xw_extra_row_bytes(n_pad, c, gd)
    if dropout_mode == 2:
        G = _pick_block_kernel_dropout(b, n_pad, g, extra)
    else:
        G = _pick_block(b, n_pad, g, backward=False, extra_row_bytes=extra)
    # Grid matches the qkv-input kernels: (hg, b//G), i fastest. The
    # head-group-fastest flip (x block surviving across hi, Mosaic
    # eliding its re-fetch) was MEASURED A SLIGHT LOSS on hardware
    # (self_attention total 18.13 -> 18.65 ms/step on the mmformer
    # profile) — the per-step w re-fetch + worse output-block locality
    # cost more than the (hg-1)·|x| reads saved.
    specs = _specs(G, n_pad, g, gd)
    in_specs = [
        pl.BlockSpec((G, n_pad, c), lambda hi, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3, gd), lambda hi, i: (0, 0, hi),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, w3]
    if dropout_mode == 1:
        in_specs.append(specs["score"])
        args.append(maskp)
    elif dropout_mode == 2:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(maskp)
    out, p, qkvp = pl.pallas_call(
        functools.partial(_sa_xw_fwd_kernel, g=g, d=d, n_valid=n_valid,
                          scale=scale, dropout_mode=dropout_mode,
                          keep_thresh=keep_thresh, inv_keep=inv_keep),
        grid=(hg, b // G),
        in_specs=in_specs,
        out_specs=[specs["out"], specs["score"], specs["qkv"]],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, hg * gd), xp.dtype),
            jax.ShapeDtypeStruct((hg, b, g * n_pad, n_pad), xp.dtype),
            jax.ShapeDtypeStruct((b, n_pad, 3, hg * gd), xp.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out, (xp, w3, qkvp, p, maskp)


def _sa_xw_bwd(static, res, dout):
    g, d, n_valid, scale, dropout_mode, keep_thresh, inv_keep = static
    xp, w3, qkvp, p, maskp = res
    b, n_pad, c = xp.shape
    gd = g * d
    if dropout_mode == 2:
        # the mask bits are a function of (block position, draw shape) —
        # the backward must re-draw at the SAME G the fused forward used
        G = _pick_block_kernel_dropout(b, n_pad, g,
                                       _xw_extra_row_bytes(n_pad, c, gd))
    else:
        G = _pick_block(b, n_pad, g, backward=True)
    dqkvp = _dqkv_pallas(static, qkvp, p, maskp, dout, G)
    dx = jnp.einsum("bnto,cto->bnc", dqkvp, w3,
                    preferred_element_type=jnp.float32).astype(xp.dtype)
    dw3 = jnp.einsum("bnc,bnto->cto", xp, dqkvp,
                     preferred_element_type=jnp.float32).astype(w3.dtype)
    return dx, dw3, jnp.zeros_like(maskp)


_sa_xw_core.defvjp(_sa_xw_fwd, _sa_xw_bwd)


def _fold_seed_words(dropout_rng) -> jnp.ndarray:
    """XOR-fold a dropout key (typed key, threefry 2-word or rbg 4-word
    uint32 data) into the (2,) i32 seed words the Mosaic-PRNG dropout
    kernels consume — the only dropout state that touches HBM in
    'kernel' mode."""
    if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(dropout_rng)
    else:
        kd = dropout_rng
    kd = jnp.asarray(kd, jnp.uint32).reshape(-1)
    nw = kd.shape[0]  # static word count
    s0, s1 = kd[0], kd[1 % nw]
    for i in range(2, nw, 2):
        s0 = s0 ^ kd[i]
    for i in range(3, nw, 2):
        s1 = s1 ^ kd[i]
    return jnp.stack([s0, s1]).astype(jnp.int32)


def _dropout_setup(train, dropout_rate, dropout_rng, dropout_impl,
                   hg, b, g, n_pad, dtype):
    """Shared (dropout_mode, keep_thresh, inv_keep, maskp) setup for the
    qkv-input and fused-GEMM entries."""
    has_dropout = bool(train and dropout_rate > 0.0)
    if has_dropout and dropout_rng is None:
        raise ValueError("dropout_rate > 0 at train needs dropout_rng")
    if dropout_impl == "kernel" and jax.default_backend() != "tpu":
        # the Mosaic PRNG has no interpret-mode lowering on this
        # toolchain — CPU (tests) takes the HBM-mask path
        dropout_impl = "hbm"

    keep_thresh, inv_keep = 0, 1.0
    if not has_dropout:
        # 1-row placeholder rides the residuals but never enters a kernel
        dropout_mode = 0
        maskp = jnp.zeros((hg, b, g, n_pad), dtype)
    elif dropout_impl == "kernel":
        dropout_mode = 2
        # keep prob as a u32 threshold (exact to 2^-32); the (2,) seed
        # words are an XOR fold of the key data — the only dropout state
        # that ever touches HBM in this mode
        keep_thresh = min(int(round((1.0 - dropout_rate) * 2 ** 32)),
                          2 ** 32 - 1)
        inv_keep = 1.0 / (1.0 - dropout_rate)
        maskp = _fold_seed_words(dropout_rng)
    else:
        dropout_mode = 1
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, (hg, b, g * n_pad, n_pad))
        maskp = keep.astype(dtype) * jnp.asarray(
            1.0 / (1.0 - dropout_rate), dtype)
    return dropout_mode, keep_thresh, inv_keep, maskp


def _pick_g(num_heads: int, d: int) -> int:
    g = max(1, min(num_heads, 128 // d))
    while num_heads % g:
        g -= 1
    return g


def sa_kernel_supported(dim: int, num_heads: int) -> bool:
    """True when the packed-head Pallas kernels can lower this head
    config. Head groups ride the 128-lane dim, so the packed group
    width g*d must be a WHOLE number of lane tiles: configs whose
    maximal g leaves g*d short of a 128 multiple (e.g. dim 64 with
    8 heads -> gd 64, or 3 heads of d 64 -> g 1) hit Mosaic's
    'infer-vector-layout: unsupported shape cast' on the in-kernel
    [.., 3, gd] -> [.., 3*gd] collapse at COMPILE time. Callers gate on
    this and fall back to the XLA attention path."""
    if num_heads <= 0 or dim % num_heads:
        return False
    d = dim // num_heads
    if d > 128 or 128 % d:
        return False
    return (_pick_g(num_heads, d) * d) % 128 == 0


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "dropout_rate", "train",
                                             "dropout_impl"))
def self_attention_fused(x: jnp.ndarray, kernel: jnp.ndarray,
                         num_heads: int,
                         scale: Optional[float] = None,
                         dropout_rate: float = 0.0,
                         dropout_rng: Optional[jax.Array] = None,
                         train: bool = False,
                         dropout_impl: str = "hbm") -> jnp.ndarray:
    """Fused multi-head self-attention INCLUDING the qkv projection GEMM.

    x: [B, N, C] (the LayerNorm output, already in compute dtype);
    kernel: [C, 3C] (the qkv Dense kernel, cast to compute dtype —
    column order [3, H, dh] as nn.Dense(3*dim) produces). Returns
    [B, N, C]. Semantics identical to
    self_attention_qkv((x @ kernel).reshape(B, N, 3, C), ...) — same
    packed-head kernels past the projection (bitwise in f32 interpret
    mode; the in-kernel GEMM rounds like XLA's bf16 GEMM on TPU) — but
    the projection output never round-trips HBM in XLA's layout: the
    kernel writes the qkv residual in its OWN tiling and the backward
    reads it copy-free (the swin fused-qkv lever, +4% there)."""
    b, n, c = x.shape
    d = c // num_heads
    scale = scale if scale is not None else d ** -0.5
    g = _pick_g(num_heads, d)
    hg = num_heads // g
    gd = g * d
    n_pad = _round_up(n, 8)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    w3 = kernel.reshape(c, 3, hg * gd)
    dropout_mode, keep_thresh, inv_keep, maskp = _dropout_setup(
        train, dropout_rate, dropout_rng, dropout_impl,
        hg, b, g, n_pad, x.dtype)
    static = (g, d, n, scale, dropout_mode, keep_thresh, inv_keep)
    out = _sa_xw_core(static, xp, w3, maskp)  # [B, Np, C]
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "dropout_rate", "train",
                                             "dropout_impl"))
def self_attention_qkv(qkv: jnp.ndarray, num_heads: int,
                       scale: Optional[float] = None,
                       dropout_rate: float = 0.0,
                       dropout_rng: Optional[jax.Array] = None,
                       train: bool = False,
                       dropout_impl: str = "hbm") -> jnp.ndarray:
    """Fused multi-head self-attention on the packed qkv projection.

    qkv: [B, N, 3, C] (the [B, N, 3C] Dense output reshaped; column order
    [3, H, dh]). Returns [B, N, C] in the same head-concatenated layout
    the proj Dense expects. Differentiable (save-p backward kernel); the
    attention-probability dropout (train only) is fused. dropout_impl:
    'hbm' draws the mask outside by one RngBitGenerator op and shares the
    array with the backward kernel; 'kernel' generates the bits with the
    in-kernel Mosaic PRNG and REGENERATES them in the backward (nothing
    score-sized touches HBM — see the module docstring; TPU only, falls
    back to 'hbm' elsewhere)."""
    b, n, three, c = qkv.shape
    assert three == 3
    d = c // num_heads
    scale = scale if scale is not None else d ** -0.5
    g = _pick_g(num_heads, d)
    hg = num_heads // g
    n_pad = _round_up(n, 8)
    qkvp = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    dropout_mode, keep_thresh, inv_keep, maskp = _dropout_setup(
        train, dropout_rate, dropout_rng, dropout_impl,
        hg, b, g, n_pad, qkv.dtype)
    static = (g, d, n, scale, dropout_mode, keep_thresh, inv_keep)
    out = _sa_core(static, qkvp, maskp)  # [B, Np, C]
    return out[:, :n]


def _sa_xw_eval_kernel(x_ref, w_ref, o_ref, *, g, d, n_valid, scale):
    """Forward-only fused qkv-GEMM + attention for EVAL/serving: no
    p/qkv residual writes, no dropout — the residual-free variant that
    won the swin eval A/B (13.21 vs 13.96 ms, window_attention.py
    _wa_xw_t_eval_kernel)."""
    G, np_, c = x_ref.shape
    gd = w_ref.shape[2]
    qkv = jax.lax.dot_general(
        x_ref[...].reshape(G * np_, c), w_ref[...].reshape(c, 3 * gd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv.reshape(G, np_, 3, gd).astype(o_ref.dtype)
    q = qkv[:, :, 0, :] * jnp.asarray(scale, qkv.dtype)
    k = qkv[:, :, 1, :]
    v = qkv[:, :, 2, :]
    bm = _blockmask(g, d, gd, q.dtype)
    q_bd = (q[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    s = jax.lax.dot_general(
        q_bd, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if n_valid < np_:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out_full = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = jnp.sum(out_full.reshape(G, g, np_, gd)
                  * bm[None, :, None, :].astype(jnp.float32), axis=1)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale"))
def self_attention_fused_eval(x: jnp.ndarray, kernel: jnp.ndarray,
                              num_heads: int,
                              scale: Optional[float] = None) -> jnp.ndarray:
    """Inference variant of self_attention_fused: same fused qkv GEMM +
    packed-head attention, but NO residual outputs and no dropout —
    non-differentiable by design (serving/eval forwards)."""
    b, n, c = x.shape
    d = c // num_heads
    scale = scale if scale is not None else d ** -0.5
    g = _pick_g(num_heads, d)
    hg = num_heads // g
    gd = g * d
    n_pad = _round_up(n, 8)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    w3 = kernel.reshape(c, 3, hg * gd)
    extra = _xw_extra_row_bytes(n_pad, c, gd)
    G = _pick_block(b, n_pad, g, backward=False, extra_row_bytes=extra)
    out = pl.pallas_call(
        functools.partial(_sa_xw_eval_kernel, g=g, d=d, n_valid=n,
                          scale=scale),
        grid=(hg, b // G),
        in_specs=[
            pl.BlockSpec((G, n_pad, c), lambda hi, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3, gd), lambda hi, i: (0, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, n_pad, gd), lambda hi, i: (i, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hg * gd), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xp, w3)
    return out[:, :n]


def self_attention_xla(qkv: jnp.ndarray, num_heads: int,
                       scale: Optional[float] = None) -> jnp.ndarray:
    """Reference XLA path on the same [B, N, 3, C] packing (no dropout) —
    the equality oracle for the kernel tests."""
    b, n, _, c = qkv.shape
    d = c // num_heads
    scale = scale if scale is not None else d ** -0.5
    x = qkv.reshape(b, n, 3, num_heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = x[0], x[1], x[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * scale, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(qkv.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)
