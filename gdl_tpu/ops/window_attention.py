"""Fused window attention for Swin — the TPU stand-in for the reference's
optional CUDA window-process kernel (models/swin_transformer.py:13-23,
absent in the reference snapshot and falling back to pure PyTorch).

Implementations, all verified equal in tests (benchmarks/RESULTS.md for
the v5e numbers):
  - `window_attention_xla`: plain jnp — the TRAINING default (fastest
    full train step; XLA autodiff saves the softmax for the backward).
  - `window_attention_xla_packed`: the block-diagonal packed-head trick
    in plain XLA — loses (expanded operands materialize in HBM); kept as
    the readable spec of the packing math.
  - `window_attention_pallas`: round-1 per-window kernel (d->128 lane
    padding); superseded by the packed kernels, kept for comparison.
  - `window_attention_pallas_packed` / `window_attention_pallas_qkv`:
    packed-head Pallas kernels — heads ride the 128-lane dim, the
    block-diagonal expansion is VMEM-only, G windows per grid step. The
    qkv-direct form is the TRAINING DEFAULT on TPU: it reads head groups
    as 128-lane blocks of the projection's natural [B, N, 3, C] layout
    (no transposes at any stage), saves the softmax as a bf16 forward
    residual, and its backward kernel skips the score recompute —
    combined with the model's window-resident stage layout and the
    round-3 transposed score layout (keys in sublanes — see the
    _wa_qkv_t_* kernels) this wins the full dual-Swin-B train step
    (204.4 vs 171.1 clips/s, RESULTS.md).
    Inference and off-TPU backends take the XLA path (the pure forward
    is faster there and the p residual would be dead weight).

Inputs:
  q, k, v: [B, H, N, D]   (B = batch·windows, H heads, N tokens, D head dim)
  bias:    [H, N, N]      relative-position bias
  mask:    [nW, N, N] or None — shifted-window mask (0 / -100), tiled over
           B in blocks of nW (swin_transformer.py WindowAttention.forward)
Returns [B, H, N, D].
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_attention_xla(q, k, v, bias, mask: Optional[jnp.ndarray] = None,
                         scale: Optional[float] = None):
    b, h, n, d = q.shape
    scale = scale if scale is not None else d ** -0.5
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b // nw, nw, h, n, n) + \
            mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(b, h, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def window_attention_xla_bnhd(qkv5, bias, mask: Optional[jnp.ndarray] = None,
                              scale: Optional[float] = None):
    """XLA attention contracted in the qkv projection's NATIVE layout.

    qkv5: [B, N, 3, H, D] (a pure reshape of the Dense output — no
    transpose). The einsums carry the head axis in place ('bnhd,bmhd->
    bhnm'), so XLA's layout assignment chooses where (if anywhere) to
    materialize a transpose instead of being handed explicit ones — the
    profiler showed the hand-written [B,N,H,D]->[B,H,N,D] transposes cost
    ~0.34 ms EACH around every attention (benchmarks/RESULTS.md).
    Returns [B, N, H*D]."""
    b, n, _, h, d = qkv5.shape
    scale = scale if scale is not None else d ** -0.5
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]  # [B, N, H, D]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = (attn.reshape(b // nw, nw, h, n, n)
                + mask[None, :, None].astype(attn.dtype)).reshape(
            b, h, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(qkv5.dtype), v,
                     preferred_element_type=jnp.float32).astype(qkv5.dtype)
    return out.reshape(b, n, h * d)


def window_attention_xla_packed(q, k, v, bias,
                                mask: Optional[jnp.ndarray] = None,
                                scale: Optional[float] = None):
    """Packed-head layout: the CLAUDE.md round-1 TODO executed.

    Swin-B stage 1 has H=4 heads of d=32 — per-head matmuls contract over
    K=32, filling only a quarter of the MXU's 128-deep systolic array (and
    the d->128 lane padding wastes 4x more). Instead pack all heads into
    the native 128-lane dim ([B, N, H*d]) and compute every head's scores
    in ONE dense batched GEMM via a block-diagonal-Q trick:

        q_bd[b, h*N+i, :] = q_packed[b, i, :] * blockmask[h]   (zeros
        outside head h's d-column block), so
        S[b, h*N+i, j] = q_bd . k_packed^T  ==  q_h[i] . k_h[j]

    contracting over the FULL K=H*d=128. The attn@v GEMM runs packed too
    ([H*N, N] x [N, H*d]) and the per-head blocks are extracted with the
    same mask. ~4x the minimal FLOPs (the zeros are multiplied), but every
    op is a dense 128-deep GEMM — a large net win over the padded per-head
    form (see benchmarks/RESULTS.md).
    """
    b, h, n, d = q.shape
    scale = scale if scale is not None else d ** -0.5
    # group g heads so g*d ~= 128 (one full lane tile / MXU depth); heads
    # beyond the group ride the batch dim — keeps the zero-FLOP factor at
    # g (=4 for d=32) at EVERY Swin stage instead of growing with H
    g = max(1, min(h, 128 // d))
    while h % g:
        g -= 1
    hg = h // g
    gd = g * d
    f32 = jnp.float32

    def pack(x):  # [B,H,N,D] -> [B*HG, N, g*d]
        x = x.reshape(b, hg, g, n, d).transpose(0, 1, 3, 2, 4)
        return x.reshape(b * hg, n, gd)

    qp = pack(q * scale)
    kp = pack(k)
    vp = pack(v)

    blockmask = (jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
                 == jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
                 ).astype(q.dtype)  # [g, g*d]: ones on head j's columns

    q_bd = (qp[:, None, :, :] * blockmask[None, :, None, :]).reshape(
        b * hg, g * n, gd)
    s = jnp.einsum("bxc,byc->bxy", q_bd, kp,
                   preferred_element_type=f32)  # [B*HG, g*N, N]
    bias_p = bias.reshape(hg, g * n, n)
    s = (s.reshape(b, hg, g * n, n) + bias_p[None].astype(s.dtype))
    if mask is not None:
        nw = mask.shape[0]
        s = (s.reshape(b // nw, nw, hg, g, n, n)
             + mask[None, :, None, None].astype(s.dtype))
    s = jax.nn.softmax(s.reshape(b * hg, g * n, n), axis=-1)
    out_full = jnp.einsum("bxy,byc->bxc", s.astype(q.dtype), vp,
                          preferred_element_type=f32).astype(q.dtype)
    out = (out_full.reshape(b * hg, g, n, gd)
           * blockmask[None, :, None, :]).sum(axis=1)  # [B*HG, N, g*d]
    out = out.reshape(b, hg, n, g, d).transpose(0, 1, 3, 2, 4)
    return out.reshape(b, h, n, d)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _wa_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale,
               n_valid):
    # blocks: q/k/v/o [1, H, Np, Dp]; bias [H, Np, Np]; mask [1, Np, Np]
    q = q_ref[0] * scale
    attn = jax.lax.dot_general(
        q, k_ref[0],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H, Np, Np]
    attn = attn + bias_ref[:].astype(jnp.float32)
    attn = attn + mask_ref[:].astype(jnp.float32)  # [1,Np,Np] broadcasts
    # mask out padded keys
    col = jax.lax.broadcasted_iota(jnp.int32, attn.shape, 2)
    attn = jnp.where(col < n_valid, attn, -1e30)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def window_attention_pallas(q, k, v, bias,
                            mask: Optional[jnp.ndarray] = None,
                            scale: Optional[float] = None):
    b, h, n, d = q.shape
    scale = scale if scale is not None else d ** -0.5
    n_pad = _round_up(n, 8)
    d_pad = _round_up(d, 128)

    def pad(x, n_axis, d_axis=None):
        pads = [(0, 0)] * x.ndim
        pads[n_axis] = (0, n_pad - n)
        if d_axis is not None:
            pads[d_axis] = (0, d_pad - d)
        return jnp.pad(x, pads)

    qp = pad(q, 2, 3)
    kp = pad(k, 2, 3)
    vp = pad(v, 2, 3)
    biasp = pad(pad(bias, 1), 2)  # [H, Np, Np]
    if mask is not None:
        nw = mask.shape[0]
        maskp = pad(pad(mask, 1), 2)  # [nW, Np, Np]
    else:
        nw = 1
        maskp = jnp.zeros((1, n_pad, n_pad), q.dtype)

    grid = (b,)
    out = pl.pallas_call(
        functools.partial(_wa_kernel, scale=scale, n_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, n_pad, d_pad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n_pad, d_pad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n_pad, d_pad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n_pad, n_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i % nw, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, n_pad, d_pad), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d_pad), q.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU CI fallback
    )(qp, kp, vp, biasp, maskp)
    return out[:, :, :n, :d]


def _wa_packed_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                      g, d, has_mask):
    """One grid step: G windows of ONE head-group, packed layout.

    blocks: q/k/v/o [1, G, Np, gd]; bias [1, g*Np, Np]; mask [G, Np, Np].
    The block-diagonal q expansion ([G, g*Np, gd], zeros outside head j's
    d-column block) lives in VMEM only — HBM sees the packed, unpadded
    tensors. Both dots contract over the full gd(=128) MXU depth.
    """
    q = q_ref[0]  # [G, Np, gd]
    G, np_, gd = q.shape
    # blockmask[j, c] = 1 iff column c belongs to head j
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    blockmask = (col_head == row_head).astype(q.dtype)  # [g, gd]

    q_bd = (q[:, None, :, :] * blockmask[None, :, None, :]).reshape(
        G, g * np_, gd)
    s = jax.lax.dot_general(
        q_bd, k_ref[0],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, Np]
    s = s + bias_ref[0].astype(jnp.float32)
    if has_mask:
        m = mask_ref[...].astype(jnp.float32)  # [G, Np, Np]
        s = (s.reshape(G, g, np_, np_) + m[:, None]).reshape(
            G, g * np_, np_)
    s = jax.nn.softmax(s, axis=-1)
    out_full = jax.lax.dot_general(
        s.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, gd]
    out = jnp.sum(out_full.reshape(G, g, np_, gd)
                  * blockmask[None, :, None, :].astype(jnp.float32), axis=1)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def window_attention_pallas_packed(q, k, v, bias,
                                   mask: Optional[jnp.ndarray] = None,
                                   scale: Optional[float] = None):
    """Packed-head, window-blocked Pallas kernel (CLAUDE.md round-1 TODO).

    Fixes both round-1 losses at once:
      - HBM: q/k/v travel PACKED as [HG, B, Np, g*d~128] — no d->128 lane
        padding (4x less traffic than the per-head kernel), and the
        block-diagonal expansion that makes the dots 128-deep happens in
        VMEM inside the kernel.
      - grid: G windows per step (G = nW for masked layers so the shift
        mask aligns; 32 otherwise) instead of one — per-step overhead
        amortized ~G-fold.
    """
    b, h, n, d = q.shape
    scale = scale if scale is not None else d ** -0.5
    g = max(1, min(h, 128 // d))
    while h % g:
        g -= 1
    hg = h // g
    gd = g * d
    n_pad = _round_up(n, 8)

    if mask is not None:
        nw = mask.shape[0]
        if b % nw:
            raise ValueError(f"windows {b} not a multiple of nW {nw}")
        G = nw  # mask alignment requires the block == one mask period
    else:
        G = 32
        while b % G:
            G //= 2
        G = max(G, 1)

    def pack(x):  # [B,H,N,D] -> [HG, B, Np, gd]
        x = x.reshape(b, hg, g, n, d).transpose(1, 0, 3, 2, 4)
        x = x.reshape(hg, b, n, gd)
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    qp = pack(q * jnp.asarray(scale, q.dtype))
    kp = pack(k)
    vp = pack(v)
    # padded-key masking folded into the bias columns (no in-kernel where)
    bias_p = jnp.pad(bias.reshape(hg, g, n, n),
                     ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    bias_p = jnp.pad(bias_p, ((0, 0), (0, 0), (0, 0), (0, n_pad - n)),
                     constant_values=-1e30)
    bias_p = bias_p.reshape(hg, g * n_pad, n_pad)
    if mask is not None:
        mask_p = jnp.pad(mask, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
    else:
        mask_p = jnp.zeros((G, n_pad, n_pad), q.dtype)

    grid = (hg, b // G)
    out = pl.pallas_call(
        functools.partial(_wa_packed_kernel, g=g, d=d,
                          has_mask=mask is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, G, n_pad, gd), lambda hi, i: (hi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, n_pad, gd), lambda hi, i: (hi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, n_pad, gd), lambda hi, i: (hi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * n_pad, n_pad), lambda hi, i: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            # masked layers have G == nW, so block i covers windows
            # [i*nW, (i+1)*nW) whose masks are exactly mask_p[0..nW)
            pl.BlockSpec((G, n_pad, n_pad), lambda hi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, n_pad, gd),
                               lambda hi, i: (hi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hg, b, n_pad, gd), q.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU CI fallback
    )(qp, kp, vp, bias_p, mask_p)
    out = out[:, :, :n, :]  # [HG, B, N, gd]
    out = out.reshape(hg, b, n, g, d).transpose(1, 0, 3, 2, 4)
    return out.reshape(b, h, n, d)


def _wa_qkv_kernel(qkv_ref, bias_ref, mask_ref, o_ref, *, g, d,
                   has_mask, scale):
    """qkv-direct variant of _wa_packed_kernel: one block [G, Np, 3, gd]
    holding q/k/v for G windows of one head-group. The head-group axis is
    a LANE-dim block of the natural [B, Np, 3, C] projection layout
    (block lane size gd=128, index hi) — no host-side transpose exists at
    any stage."""
    q = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    G, np_, gd = q.shape
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    blockmask = (col_head == row_head).astype(q.dtype)

    q_bd = (q[:, None, :, :] * blockmask[None, :, None, :]).reshape(
        G, g * np_, gd)
    s = jax.lax.dot_general(
        q_bd, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)
    if has_mask:
        m = mask_ref[...].astype(jnp.float32)
        s = (s.reshape(G, g, np_, np_) + m[:, None]).reshape(
            G, g * np_, np_)
    s = jax.nn.softmax(s, axis=-1)
    out_full = jax.lax.dot_general(
        s.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = jnp.sum(out_full.reshape(G, g, np_, gd)
                  * blockmask[None, :, None, :].astype(jnp.float32), axis=1)
    o_ref[...] = out.astype(o_ref.dtype)


def _wa_qkv_bwd_kernel(qkv_ref, bias_ref, mask_ref, dout_ref,
                       dqkv_ref, dbias_ref, *, g, d, has_mask,
                       scale):
    """Backward of _wa_qkv_kernel, flash-style: recompute the softmax in
    VMEM, then dq/dk/dv via the same block-diagonal packing (every dot is
    gd- or g*Np-deep). dbias accumulates across the window-block grid axis
    (the output block is revisited on consecutive steps)."""
    i = pl.program_id(1)
    qs = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    dout = dout_ref[...]  # [G, Np, gd]
    G, np_, gd = qs.shape
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    blockmask = (col_head == row_head).astype(qs.dtype)

    # ---- recompute p (identical to the forward) ----
    q_bd = (qs[:, None, :, :] * blockmask[None, :, None, :]).reshape(
        G, g * np_, gd)
    s = jax.lax.dot_general(
        q_bd, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)
    if has_mask:
        m = mask_ref[...].astype(jnp.float32)
        s = (s.reshape(G, g, np_, np_) + m[:, None]).reshape(
            G, g * np_, np_)
    p = jax.nn.softmax(s, axis=-1)  # [G, g*Np, Np] fp32

    dout_bd = (dout[:, None, :, :] * blockmask[None, :, None, :]).reshape(
        G, g * np_, gd)
    # dv[j, c@h] = sum_i p[(h,i), j] * dout_bd[(h,i), c]
    dv = jax.lax.dot_general(
        p.astype(dout.dtype), dout_bd,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np, gd]
    # dp[(h,i), j] = dout_h[i] . v_h[j]
    dp = jax.lax.dot_general(
        dout_bd, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, Np]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # fp32

    # dq_scaled = blockextract(ds . k); dq = dq_scaled * scale
    dq_full = jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, gd]
    dq = jnp.sum(dq_full.reshape(G, g, np_, gd)
                 * blockmask[None, :, None, :].astype(jnp.float32),
                 axis=1) * scale
    # dk[j, c@h] = sum_i ds[(h,i), j] * q_bd[(h,i), c]   (q_bd == q*scale)
    dk = jax.lax.dot_general(
        ds.astype(q_bd.dtype), q_bd,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np, gd]

    dqkv_ref[:, :, 0, :] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 1, :] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 2, :] = dv.astype(dqkv_ref.dtype)

    @pl.when(i == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    dbias_ref[0] += jnp.sum(ds, axis=0).astype(dbias_ref.dtype)


def _wa_qkv_savep_kernel(qkv_ref, bias_ref, mask_ref, o_ref, p_ref, *, g, d,
                         has_mask, scale):
    """_wa_qkv_kernel that ALSO writes the softmax probabilities p as a
    forward residual (in the input dtype), so the backward kernel skips the score-matmul
    + softmax recompute entirely (the recorded round-2 lever: 'save p as a
    fwd residual', benchmarks/RESULTS.md)."""
    q = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    G, np_, gd = q.shape
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    blockmask = (col_head == row_head).astype(q.dtype)

    q_bd = (q[:, None, :, :] * blockmask[None, :, None, :]).reshape(
        G, g * np_, gd)
    s = jax.lax.dot_general(
        q_bd, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s + bias_ref[0].astype(jnp.float32)
    if has_mask:
        m = mask_ref[...].astype(jnp.float32)
        s = (s.reshape(G, g, np_, np_) + m[:, None]).reshape(
            G, g * np_, np_)
    p = jax.nn.softmax(s, axis=-1)
    p_ref[0] = p.astype(p_ref.dtype)
    out_full = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out = jnp.sum(out_full.reshape(G, g, np_, gd)
                  * blockmask[None, :, None, :].astype(jnp.float32), axis=1)
    o_ref[...] = out.astype(o_ref.dtype)


def _wa_qkv_bwd_p_kernel(qkv_ref, p_ref, dout_ref, dqkv_ref, dbias_ref, *,
                         g, d, scale):
    """Backward from the SAVED p residual — no score recompute, no
    bias/mask inputs (they only affect the backward through p). One fewer
    big matmul and no softmax per block vs _wa_qkv_bwd_kernel; padded rows
    and columns self-zero because the upstream dout is zero there and
    padded-column p entries are ~0."""
    i = pl.program_id(1)
    qs = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    p = p_ref[0].astype(jnp.float32)  # [G, g*Np, Np]
    dout = dout_ref[...]  # [G, Np, gd]
    G, np_, gd = qs.shape
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    blockmask = (col_head == row_head).astype(qs.dtype)

    dout_bd = (dout[:, None, :, :] * blockmask[None, :, None, :]).reshape(
        G, g * np_, gd)
    dv = jax.lax.dot_general(
        p.astype(dout.dtype), dout_bd,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np, gd]
    dp = jax.lax.dot_general(
        dout_bd, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np, Np]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq_full = jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dq = jnp.sum(dq_full.reshape(G, g, np_, gd)
                 * blockmask[None, :, None, :].astype(jnp.float32),
                 axis=1) * scale
    q_bd = (qs[:, None, :, :] * blockmask[None, :, None, :]).reshape(
        G, g * np_, gd)
    dk = jax.lax.dot_general(
        ds.astype(q_bd.dtype), q_bd,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    dqkv_ref[:, :, 0, :] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 1, :] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 2, :] = dv.astype(dqkv_ref.dtype)

    @pl.when(i == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    dbias_ref[0] += jnp.sum(ds, axis=0).astype(dbias_ref.dtype)


def _qkv_specs(G, n_pad, g, gd, nw):
    """Block specs for the qkv kernels. G must DIVIDE the mask period nW;
    block i covers windows [i*G, (i+1)*G) whose masks are the (i mod
    nW/G)-th chunk of the mask array. The head-group axis hi is a LANE-dim
    block (gd=128 lanes) of the projection's natural [B, Np, 3, C] /
    [B, Np, C] layouts — no host-side head transpose exists for any head
    count (the earlier layout led with hg and forced a real [B,N,3,hg,gd]
    -> [hg,B,N,3,gd] transpose at every stage-2/3/4 site)."""
    n_chunks = max(nw // G, 1)
    return dict(
        qkv=pl.BlockSpec((G, n_pad, 3, gd),
                         lambda hi, i: (i, 0, 0, hi),
                         memory_space=pltpu.VMEM),
        bias=pl.BlockSpec((1, g * n_pad, n_pad), lambda hi, i: (hi, 0, 0),
                          memory_space=pltpu.VMEM),
        mask=pl.BlockSpec((G, n_pad, n_pad),
                          lambda hi, i: (i % n_chunks, 0, 0),
                          memory_space=pltpu.VMEM),
        out=pl.BlockSpec((G, n_pad, gd), lambda hi, i: (i, 0, hi),
                         memory_space=pltpu.VMEM),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qkv_attn_core(static, qkvp, bias_p, mask_p):
    """out_packed [HG, B, Np, gd] from packed inputs; static is the
    hashable config tuple (g, d, has_mask, scale, G, nW)."""
    return _qkv_attn_fwd(static, qkvp, bias_p, mask_p)[0]


def _qkv_attn_fwd(static, qkvp, bias_p, mask_p):
    g, d, has_mask, scale, G, nw = static
    b, n_pad, _, c = qkvp.shape
    gd = g * d
    hg = c // gd
    specs = _qkv_specs(G, n_pad, g, gd, nw)
    out = pl.pallas_call(
        functools.partial(_wa_qkv_kernel, g=g, d=d,
                          has_mask=has_mask, scale=scale),
        grid=(hg, b // G),
        in_specs=[specs["qkv"], specs["bias"], specs["mask"]],
        out_specs=specs["out"],
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hg * gd), qkvp.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qkvp, bias_p, mask_p)
    return out, (qkvp, bias_p, mask_p)


def _qkv_attn_bwd(static, res, dout):
    g, d, has_mask, scale, G, nw = static
    qkvp, bias_p, mask_p = res
    b, n_pad, _, c = qkvp.shape
    gd = g * d
    hg = c // gd
    # the backward kernel holds ~2x the forward's live VMEM (p, dp, ds,
    # dout_bd all at once) — halve the window block to stay under the
    # 16 MB scoped-vmem limit
    G = math.gcd(G, 16)
    specs = _qkv_specs(G, n_pad, g, gd, nw)
    dqkvp, dbias_p = pl.pallas_call(
        functools.partial(_wa_qkv_bwd_kernel, g=g, d=d,
                          has_mask=has_mask, scale=scale),
        grid=(hg, b // G),
        in_specs=[specs["qkv"], specs["bias"], specs["mask"], specs["out"]],
        out_specs=[
            specs["qkv"],
            pl.BlockSpec((1, g * n_pad, n_pad), lambda hi, i: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qkvp.shape, qkvp.dtype),
            jax.ShapeDtypeStruct(bias_p.shape, jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qkvp, bias_p, mask_p, dout)
    return dqkvp, dbias_p.astype(bias_p.dtype), jnp.zeros_like(mask_p)


_qkv_attn_core.defvjp(_qkv_attn_fwd, _qkv_attn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qkv_attn_core_savep(static, qkvp, bias_p, mask_p):
    """_qkv_attn_core with the softmax saved as a forward residual."""
    return _qkv_attn_savep_fwd(static, qkvp, bias_p, mask_p)[0]


def _qkv_attn_savep_fwd(static, qkvp, bias_p, mask_p):
    g, d, has_mask, scale, G, nw = static
    b, n_pad, _, c = qkvp.shape
    gd = g * d
    hg = c // gd
    specs = _qkv_specs(G, n_pad, g, gd, nw)
    out, p = pl.pallas_call(
        functools.partial(_wa_qkv_savep_kernel, g=g, d=d,
                          has_mask=has_mask, scale=scale),
        grid=(hg, b // G),
        in_specs=[specs["qkv"], specs["bias"], specs["mask"]],
        out_specs=[
            specs["out"],
            pl.BlockSpec((1, G, g * n_pad, n_pad),
                         lambda hi, i: (hi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, hg * gd), qkvp.dtype),
            jax.ShapeDtypeStruct((hg, b, g * n_pad, n_pad), qkvp.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qkvp, bias_p, mask_p)
    return out, (qkvp, p, bias_p, mask_p)


def _qkv_attn_savep_bwd(static, res, dout):
    g, d, has_mask, scale, G, nw = static
    qkvp, p, bias_p, mask_p = res
    b, n_pad, _, c = qkvp.shape
    gd = g * d
    hg = c // gd
    # the residual-p backward holds p, dp, ds concurrently (~3 score-sized
    # f32 arrays) — same halved window block as the recompute backward
    G = math.gcd(G, 16)
    specs = _qkv_specs(G, n_pad, g, gd, nw)
    p_spec = pl.BlockSpec((1, G, g * n_pad, n_pad),
                          lambda hi, i: (hi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    dqkvp, dbias_p = pl.pallas_call(
        functools.partial(_wa_qkv_bwd_p_kernel, g=g, d=d, scale=scale),
        grid=(hg, b // G),
        in_specs=[specs["qkv"], p_spec, specs["out"]],
        out_specs=[
            specs["qkv"],
            pl.BlockSpec((1, g * n_pad, n_pad), lambda hi, i: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qkvp.shape, qkvp.dtype),
            jax.ShapeDtypeStruct((hg, g * n_pad, n_pad), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qkvp, p, dout)
    return dqkvp, dbias_p.astype(bias_p.dtype), jnp.zeros_like(mask_p)


_qkv_attn_core_savep.defvjp(_qkv_attn_savep_fwd, _qkv_attn_savep_bwd)

# ---------------------------------------------------------------------------
# Transposed-score kernels (round 3): keys ride the SUBLANE dim, the packed
# query-head axis rides the LANES. Swin scores are [g*Np, Np] = [224, 56]
# per window in the row layout: the 56-lane dim wastes 56% of every 128-
# lane vreg and every score-shaped elementwise op. Transposed, the score
# block is [Np, g*Np] = [56, 224] — 87.5% lane use, HALF the vreg tiles
# and half the score VMEM — and every dot (s, out, dv, dp, dq, dk) lands
# NATURALLY in this layout (contract the sublane or lane dim directly),
# so no transpose is added anywhere. Softmax reduces over sublanes.
# ---------------------------------------------------------------------------


def _wa_qkv_t_savep_kernel(qkv_ref, bias_ref, mask_ref, o_ref, p_ref, *,
                           g, d, has_mask, scale):
    """Forward, transposed scores, softmax saved as residual.

    blocks: qkv [G, Np, 3, gd]; bias [1, Np_k, g*Np_q] (padded KEY rows
    already hold -1e30); mask [G, Np_k, g*Np_q] (pre-tiled over heads);
    o [G, Np, gd]; p residual [1, G, Np_k, g*Np_q]."""
    q = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    G, np_, gd = q.shape
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    bm = (col_head == row_head).astype(q.dtype)

    q_bd = (q[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    s_t = jax.lax.dot_general(
        k, q_bd, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, g*Np_q]
    s_t = s_t + bias_ref[0].astype(jnp.float32)
    if has_mask:
        s_t = s_t + mask_ref[...].astype(jnp.float32)
    p_t = jax.nn.softmax(s_t, axis=1)  # over keys (sublanes)
    p_ref[0] = p_t.astype(p_ref.dtype)
    out_full = jax.lax.dot_general(
        p_t.astype(v.dtype), v,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np_q, gd]
    out = jnp.sum(out_full.reshape(G, g, np_, gd)
                  * bm[None, :, None, :].astype(jnp.float32), axis=1)
    o_ref[...] = out.astype(o_ref.dtype)


def _wa_qkv_t_bwd_p_kernel(qkv_ref, p_ref, dout_ref, dqkv_ref, dbias_ref,
                           *, g, d, scale):
    """Backward from the transposed saved p — every dot contracts a
    natural axis of the transposed layout; dbias accumulates transposed
    ([1, Np_k, g*Np_q]) and the wrapper's autodiff through the bias
    packing maps it back to the caller's [H, N, N]."""
    i = pl.program_id(1)
    qs = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    p_t = p_ref[0].astype(jnp.float32)  # [G, Np_k, g*Np_q]
    dout = dout_ref[...]  # [G, Np, gd]
    G, np_, gd = qs.shape
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    bm = (col_head == row_head).astype(qs.dtype)

    dout_bd = (dout[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    # dv[j, c] = sum_(h,i) p_t[j, (h,i)] * dout_bd[(h,i), c]
    dv = jax.lax.dot_general(
        p_t.astype(dout.dtype), dout_bd,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, gd]
    # dp_t[j, (h,i)] = v_h[j] . dout_h[i]
    dp_t = jax.lax.dot_general(
        v, dout_bd, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, g*Np_q]
    ds_t = p_t * (dp_t - jnp.sum(dp_t * p_t, axis=1, keepdims=True))

    # dq[(h,i)] = sum_j ds_t[j, (h,i)] * k[j]  (then * scale)
    dq_full = jax.lax.dot_general(
        ds_t.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np_q, gd]
    dq = jnp.sum(dq_full.reshape(G, g, np_, gd)
                 * bm[None, :, None, :].astype(jnp.float32),
                 axis=1) * scale
    # dk[j] = sum_(h,i) ds_t[j, (h,i)] * q_bd[(h,i)]
    q_bd = (qs[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    dk = jax.lax.dot_general(
        ds_t.astype(q_bd.dtype), q_bd,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, gd]

    dqkv_ref[:, :, 0, :] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 1, :] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 2, :] = dv.astype(dqkv_ref.dtype)

    @pl.when(i == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    dbias_ref[0] += jnp.sum(ds_t, axis=0).astype(dbias_ref.dtype)


def _wa_qkv_t_bwd_pd_kernel(qkv_ref, p_ref, dout_ref, delta_ref,
                            dqkv_ref, dbias_ref, *, g, d, scale):
    """Delta-trick variant of _wa_qkv_t_bwd_p_kernel (the flash-attention
    backward identity): the softmax-jacobian row sums Σ_k dp·p equal
    dout·out per query row, so the kernel takes them PRECOMPUTED (an
    out-sized XLA reduction outside) instead of materializing the
    score-sized dp*p product + reduction in VMEM. One fewer score-sized
    f32 temporary per window block — the round-3 G=32 transposed backward
    OOMed scoped vmem by only 900 KB (16.88M/16M at stage 3), so this is
    the structural lever that can lift the backward block back to the
    forward's G (VERDICT r4 item 5).

    delta block: [G, 1, g*Np_q] f32 (broadcasts over the key sublanes)."""
    i = pl.program_id(1)
    qs = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    p_t = p_ref[0].astype(jnp.float32)  # [G, Np_k, g*Np_q]
    dout = dout_ref[...]  # [G, Np, gd]
    delta = delta_ref[0]  # [G, 1, g*Np_q] f32
    G, np_, gd = qs.shape
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    bm = (col_head == row_head).astype(qs.dtype)

    dout_bd = (dout[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    dv = jax.lax.dot_general(
        p_t.astype(dout.dtype), dout_bd,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, gd]
    dp_t = jax.lax.dot_general(
        v, dout_bd, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, g*Np_q]
    ds_t = p_t * (dp_t - delta)

    dq_full = jax.lax.dot_general(
        ds_t.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np_q, gd]
    dq = jnp.sum(dq_full.reshape(G, g, np_, gd)
                 * bm[None, :, None, :].astype(jnp.float32),
                 axis=1) * scale
    q_bd = (qs[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    dk = jax.lax.dot_general(
        ds_t.astype(q_bd.dtype), q_bd,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, gd]

    dqkv_ref[:, :, 0, :] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 1, :] = dk.astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 2, :] = dv.astype(dqkv_ref.dtype)

    @pl.when(i == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    dbias_ref[0] += jnp.sum(ds_t, axis=0).astype(dbias_ref.dtype)


def _pack_delta_t(out, dout, g, d, hg):
    """The flash-backward row sums Σ_k dp·p = dout·out per (head, query),
    packed into the transposed kernels' lane order (h·Np + i):
    [HG, B, 1, g·Np] f32. An out-sized elementwise multiply + segment
    reduce + small transpose in XLA — cheap vs the score-sized VMEM
    temporary it replaces."""
    b, n_pad, _ = out.shape
    do = out.astype(jnp.float32) * dout.astype(jnp.float32)
    delta = do.reshape(b, n_pad, hg, g, d).sum(-1)  # [B, Np, HG, g]
    delta = delta.transpose(2, 0, 3, 1)  # [HG, B, g, Np]
    return delta.reshape(hg, b, 1, g * n_pad)


# Delta-trick backward gate (VERDICT r4 item 5 — the flash-style
# structural attempt): True routes the transposed save-p backward
# through _wa_qkv_t_bwd_pd_kernel with the window block raised to
# BWD_DELTA_G (the dp*p temp it removes is what was hypothesized to OOM
# G=32). MEASURED NEGATIVE on hardware (benchmarks/RESULTS.md round 5,
# dual Swin-B joint bs32, chained-loop device timing):
#   delta off (shipping)      147.86 ms/step  216.4 clips/s
#   delta on, G=16            150.96 ms/step  212.0 clips/s  (-2.0%)
#   delta on, G=32            compile OOM: scoped vmem 20.38M/16M
# The G=32 deficit is 4.38M — far beyond the one score-sized temp the
# trick removes (Mosaic had evidently already fused the dp*p multiply
# into its reduction), and the kernel's VMEM footprint is
# stage-independent (every block is [*, 56, *, 128]-shaped at head dim
# 32), so no stage admits the doubled block. At G=16 the extra delta
# input block + the XLA-side out-sized reduction + the extended out
# liveness cost ~3 ms/step net. Default OFF; kernel + tests kept as the
# recorded disposition.
BWD_DELTA = False
BWD_DELTA_G = 16


def _qkv_t_specs(G, n_pad, g, gd, nw):
    """Transposed-score analogs of _qkv_specs (same qkv/out blocks)."""
    base = _qkv_specs(G, n_pad, g, gd, nw)
    n_chunks = max(nw // G, 1)
    return dict(
        qkv=base["qkv"],
        out=base["out"],
        bias=pl.BlockSpec((1, n_pad, g * n_pad), lambda hi, i: (hi, 0, 0),
                          memory_space=pltpu.VMEM),
        mask=pl.BlockSpec((G, n_pad, g * n_pad),
                          lambda hi, i: (i % n_chunks, 0, 0),
                          memory_space=pltpu.VMEM),
        p=pl.BlockSpec((1, G, n_pad, g * n_pad),
                       lambda hi, i: (hi, i, 0, 0),
                       memory_space=pltpu.VMEM),
    )


def _attn_bwd_pallas_t(qkvp, p, dout, out_res, G, n_pad, g, d, gd, nw,
                       hg, scale):
    """Shared transposed-score attention backward dispatch for the qkv
    and fused-GEMM entries (their phase-1 splits are identical). The
    BWD_DELTA gate selects the delta-trick kernel plus its packed-delta
    operand (out_res is only read there — the forwards stash it in the
    residuals only under the gate); the default is the save-p kernel at
    the halved backward block. Returns (dqkvp, dbias_t_f32)."""
    b = qkvp.shape[0]
    if BWD_DELTA:
        # delta-trick backward: the removed dp*p score temp is what made
        # the full-G block OOM (900 KB over at stage 3) — raise the block
        Gb = math.gcd(G, BWD_DELTA_G)
        kernel = functools.partial(_wa_qkv_t_bwd_pd_kernel, g=g, d=d,
                                   scale=scale)
        extra_in = [pl.BlockSpec((1, Gb, 1, g * n_pad),
                                 lambda hi, i: (hi, i, 0, 0),
                                 memory_space=pltpu.VMEM)]
        extra_ops = [_pack_delta_t(out_res, dout, g, d, hg)]
    else:
        # halved backward block: even with the transposed scores' 2x
        # smaller VMEM footprint, the full G=32 backward OOMs scoped vmem
        # by 900 KB at stage 3 (16.88M/16M measured) — the bwd holds
        # p/dp/ds plus q_bd and dout_bd concurrently
        Gb = math.gcd(G, 16)
        kernel = functools.partial(_wa_qkv_t_bwd_p_kernel, g=g, d=d,
                                   scale=scale)
        extra_in, extra_ops = [], []
    specs = _qkv_t_specs(Gb, n_pad, g, gd, nw)
    return pl.pallas_call(
        kernel,
        grid=(hg, b // Gb),
        in_specs=[specs["qkv"], specs["p"], specs["out"], *extra_in],
        out_specs=[
            specs["qkv"],
            pl.BlockSpec((1, n_pad, g * n_pad), lambda hi, i: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qkvp.shape, qkvp.dtype),
            jax.ShapeDtypeStruct((hg, n_pad, g * n_pad), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qkvp, p, dout, *extra_ops)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qkv_attn_core_savep_t(static, qkvp, bias_t, mask_t):
    """Transposed-score savep core; static = (g, d, has_mask, scale, G,
    nW). bias_t [HG, Np_k, g*Np_q] (padded-key rows -1e30); mask_t
    [nW, Np_k, g*Np_q] pre-tiled over the g heads."""
    return _qkv_attn_savep_t_fwd(static, qkvp, bias_t, mask_t)[0]


def _qkv_attn_savep_t_fwd(static, qkvp, bias_t, mask_t):
    g, d, has_mask, scale, G, nw = static
    b, n_pad, _, c = qkvp.shape
    gd = g * d
    hg = c // gd
    specs = _qkv_t_specs(G, n_pad, g, gd, nw)
    out, p = pl.pallas_call(
        functools.partial(_wa_qkv_t_savep_kernel, g=g, d=d,
                          has_mask=has_mask, scale=scale),
        grid=(hg, b // G),
        in_specs=[specs["qkv"], specs["bias"], specs["mask"]],
        out_specs=[specs["out"], specs["p"]],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, hg * gd), qkvp.dtype),
            jax.ShapeDtypeStruct((hg, b, n_pad, g * n_pad), qkvp.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qkvp, bias_t, mask_t)
    # out joins the residuals only for the delta-trick backward (the one
    # consumer); the default path keeps the residual contract minimal so
    # out's liveness ends at the forward
    return out, (qkvp, p, out if BWD_DELTA else None, bias_t, mask_t)


def _qkv_attn_savep_t_bwd(static, res, dout):
    g, d, has_mask, scale, G, nw = static
    qkvp, p, out_res, bias_t, mask_t = res
    b, n_pad, _, c = qkvp.shape
    gd = g * d
    hg = c // gd
    dqkvp, dbias_t = _attn_bwd_pallas_t(qkvp, p, dout, out_res, G, n_pad,
                                        g, d, gd, nw, hg, scale)
    return dqkvp, dbias_t.astype(bias_t.dtype), jnp.zeros_like(mask_t)


_qkv_attn_core_savep_t.defvjp(_qkv_attn_savep_t_fwd, _qkv_attn_savep_t_bwd)


# ---------------------------------------------------------------------------
# Fused-GEMM entry (round 3): the qkv PROJECTION runs inside the forward
# kernel. Motivation is LAYOUT, not FLOPs: for 3C <= 1536 XLA's conv
# emitter produces the qkv GEMM output batch-in-lanes ({0,2,1} — profiled
# EmitOutputBatchInLanes) while Mosaic requires the default row-major
# operand layout, so every kernel boundary paid a layout-conversion copy
# (12.5 ms/step of the dual-Swin-B joint step, ~8%). With the GEMM
# in-kernel, x arrives from the LayerNorm loop fusion (layout-flexible —
# no copy), the saved qkv residual is kernel-PRODUCED in default layout
# (no copy into the backward kernel), and W is re-read per block as a
# [C, 3, gd] lane-block slice (a few MB/step — negligible). The backward
# ships as the phase-1 split (unchanged attention backward kernel +
# plain XLA dx/dW/db GEMMs from its dqkv output — those still pay one
# dqkv conversion per site); the phase-2 fully-fused backward exists
# behind FUSED_PROJECTION_BACKWARD below, correctness-tested but
# unmeasured (tunnel outage — see that gate's comment).
# ---------------------------------------------------------------------------


def _wa_xw_t_savep_kernel(x_ref, w_ref, bv_ref, bias_ref, mask_ref,
                          o_ref, p_ref, qkv_ref, *, g, d, has_mask, scale):
    """Forward with the in-kernel qkv GEMM, transposed scores, softmax
    saved as residual.

    blocks: x [G, Np, C] (full feature dim); w [C, 3, gd] (this head
    group's lane-block of the [C, 3, HG*gd] projection); bv [3, gd];
    bias [1, Np_k, g*Np_q]; mask [G, Np_k, g*Np_q]; outputs o [G, Np,
    gd], p [1, G, Np_k, g*Np_q], qkv [G, Np, 3, gd] (the residual the
    unchanged backward kernel consumes)."""
    x = x_ref[...]
    G, np_, c = x.shape
    gd = w_ref.shape[2]
    # the GEMM: same rounding point as the XLA Dense it replaces (bf16
    # operands, f32 accumulate, round to input dtype, then bias add)
    qkv = jax.lax.dot_general(
        x.reshape(G * np_, c), w_ref[...].reshape(c, 3 * gd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv.astype(x.dtype).reshape(G, np_, 3, gd) + \
        bv_ref[...][None, None]
    qkv_ref[...] = qkv

    q = qkv[:, :, 0, :] * jnp.asarray(scale, qkv.dtype)
    k = qkv[:, :, 1, :]
    v = qkv[:, :, 2, :]
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    bm = (col_head == row_head).astype(q.dtype)

    q_bd = (q[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    s_t = jax.lax.dot_general(
        k, q_bd, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, g*Np_q]
    s_t = s_t + bias_ref[0].astype(jnp.float32)
    if has_mask:
        s_t = s_t + mask_ref[...].astype(jnp.float32)
    p_t = jax.nn.softmax(s_t, axis=1)  # over keys (sublanes)
    p_ref[0] = p_t.astype(p_ref.dtype)
    out_full = jax.lax.dot_general(
        p_t.astype(v.dtype), v,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np_q, gd]
    out = jnp.sum(out_full.reshape(G, g, np_, gd)
                  * bm[None, :, None, :].astype(jnp.float32), axis=1)
    o_ref[...] = out.astype(o_ref.dtype)


def _wa_xw_t_eval_kernel(x_ref, w_ref, bv_ref, bias_ref, mask_ref,
                         o_ref, *, g, d, has_mask, scale):
    """Forward-ONLY fused-GEMM kernel (inference): identical math to
    _wa_xw_t_savep_kernel but qkv and the softmax stay VMEM values —
    no residual writes. Round 2 measured the save-p Pallas forward
    LOSING eval to plain XLA (16.8 vs 14.57 ms dual Swin-B) precisely
    because it writes p ([HG, B, Np, g*Np]) and qkv ([B, Np, 3, C])
    residuals nothing consumes; this variant exists to contest eval
    without them."""
    x = x_ref[...]
    G, np_, c = x.shape
    gd = w_ref.shape[2]
    qkv = jax.lax.dot_general(
        x.reshape(G * np_, c), w_ref[...].reshape(c, 3 * gd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv.astype(x.dtype).reshape(G, np_, 3, gd) + \
        bv_ref[...][None, None]

    q = qkv[:, :, 0, :] * jnp.asarray(scale, qkv.dtype)
    k = qkv[:, :, 1, :]
    v = qkv[:, :, 2, :]
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    bm = (col_head == row_head).astype(q.dtype)

    q_bd = (q[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    s_t = jax.lax.dot_general(
        k, q_bd, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, g*Np_q]
    s_t = s_t + bias_ref[0].astype(jnp.float32)
    if has_mask:
        s_t = s_t + mask_ref[...].astype(jnp.float32)
    p_t = jax.nn.softmax(s_t, axis=1)
    out_full = jax.lax.dot_general(
        p_t.astype(v.dtype), v,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np_q, gd]
    out = jnp.sum(out_full.reshape(G, g, np_, gd)
                  * bm[None, :, None, :].astype(jnp.float32), axis=1)
    o_ref[...] = out.astype(o_ref.dtype)


def _wa_xw_t_bwd_fused_kernel(qkv_ref, p_ref, dout_ref, x_ref, w_ref,
                              dx_ref, dwp_ref, dbp_ref, dbiasp_ref,
                              dx_acc, *, g, d, scale, hg):
    """Phase-2 backward: attention backward AND the projection backward
    in one kernel, so dqkv never reaches HBM (its [B, Np, 3, C] write +
    three re-reads + the batch-in-lanes conversion copies feeding the dW
    GEMM all disappear).

    Grid is FLIPPED vs the forward: (b//G, hg) with the head-group axis
    fastest, so the dx block (depending on i only) is revisited on
    consecutive steps and accumulates in an f32 VMEM scratch (one
    rounding to bf16 at the last head group — better than per-group
    rounding). dW accumulates in a VMEM-RESIDENT [hg, c, 3*gd] slab
    whose block index is constant over the whole grid (the standard
    reduction-residency pattern): one HBM write total, vs per-(i, hi)
    partials which would cost (b/Gb)*3c^2*4 bytes (~100 MB/block-layer
    at Swin-B stage 3/4 — more than the dqkv round trip they replace).
    db/dbias stay per-window-block partials (tiny) reduced by XLA
    outside."""
    hi = pl.program_id(1)
    qs = qkv_ref[:, :, 0, :] * jnp.asarray(scale, qkv_ref.dtype)
    k = qkv_ref[:, :, 1, :]
    v = qkv_ref[:, :, 2, :]
    p_t = p_ref[0].astype(jnp.float32)  # [G, Np_k, g*Np_q]
    dout = dout_ref[...]  # [G, Np, gd]
    G, np_, gd = qs.shape
    col_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
    bm = (col_head == row_head).astype(qs.dtype)

    dout_bd = (dout[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    dv = jax.lax.dot_general(
        p_t.astype(dout.dtype), dout_bd,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, gd]
    dp_t = jax.lax.dot_general(
        v, dout_bd, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, g*Np_q]
    ds_t = p_t * (dp_t - jnp.sum(dp_t * p_t, axis=1, keepdims=True))

    dq_full = jax.lax.dot_general(
        ds_t.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, g*Np_q, gd]
    dq = jnp.sum(dq_full.reshape(G, g, np_, gd)
                 * bm[None, :, None, :].astype(jnp.float32),
                 axis=1) * scale
    q_bd = (qs[:, None, :, :] * bm[None, :, None, :]).reshape(
        G, g * np_, gd)
    dk = jax.lax.dot_general(
        ds_t.astype(q_bd.dtype), q_bd,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, Np_k, gd]

    # dqkv as a VMEM value only — in the forward's dtype, matching what
    # the phase-1 XLA GEMMs consumed
    dqkv = jnp.stack([dq, dk, dv], axis=2).astype(qs.dtype)
    dq2 = dqkv.reshape(G * np_, 3 * gd)

    c = x_ref.shape[-1]
    contrib = jax.lax.dot_general(
        dq2, w_ref[...].reshape(c, 3 * gd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [G*Np, C]

    @pl.when(hi == 0)
    def _():
        dx_acc[...] = jnp.zeros_like(dx_acc)

    dx_acc[...] += contrib.reshape(G, np_, c)

    @pl.when(hi == hg - 1)
    def _():
        dx_ref[...] = dx_acc[...].astype(dx_ref.dtype)

    x2 = x_ref[...].reshape(G * np_, c)
    dw_part = jax.lax.dot_general(
        x2, dq2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [c, 3*gd]

    i = pl.program_id(0)

    @pl.when(jnp.logical_and(i == 0, hi == 0))
    def _():
        dwp_ref[...] = jnp.zeros_like(dwp_ref)

    # static per-head-group stores (hi selects the slab row via pl.when
    # — unrolled hg <= 8 ways; dynamic leading-dim stores would also
    # work but the static form is unconditionally Mosaic-legal)
    for k_hg in range(hg):
        @pl.when(hi == k_hg)
        def _(k_hg=k_hg):
            dwp_ref[k_hg] += dw_part

    dbp_ref[0] = jnp.sum(dqkv.astype(jnp.float32),
                         axis=(0, 1))  # [3, gd]
    dbiasp_ref[0, 0] = jnp.sum(ds_t, axis=0)  # [Np_k, g*Np_q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _xw_attn_core_savep_t(static, xp, w3, bv, bias_t, mask_t):
    """Fused-GEMM transposed-score savep core. xp [B, Np, C]; w3
    [C, 3, HG*gd] (the Dense kernel reshaped — its column order is
    already [3, H, dh]); bv [3, HG*gd]; bias_t/mask_t as in
    _qkv_attn_core_savep_t. static = (g, d, has_mask, scale, G, nW)."""
    return _xw_attn_savep_t_fwd(static, xp, w3, bv, bias_t, mask_t)[0]


def _xw_attn_savep_t_fwd(static, xp, w3, bv, bias_t, mask_t):
    g, d, has_mask, scale, G, nw = static
    b, n_pad, c = xp.shape
    gd = g * d
    hg = w3.shape[2] // gd
    specs = _qkv_t_specs(G, n_pad, g, gd, nw)
    out, p, qkvp = pl.pallas_call(
        functools.partial(_wa_xw_t_savep_kernel, g=g, d=d,
                          has_mask=has_mask, scale=scale),
        grid=(hg, b // G),
        in_specs=[
            pl.BlockSpec((G, n_pad, c), lambda hi, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3, gd), lambda hi, i: (0, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, gd), lambda hi, i: (0, hi),
                         memory_space=pltpu.VMEM),
            specs["bias"], specs["mask"],
        ],
        out_specs=[specs["out"], specs["p"], specs["qkv"]],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, hg * gd), xp.dtype),
            jax.ShapeDtypeStruct((hg, b, n_pad, g * n_pad), xp.dtype),
            jax.ShapeDtypeStruct((b, n_pad, 3, hg * gd), xp.dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xp, w3, bv, bias_t, mask_t)
    # out in residuals ONLY under BWD_DELTA — see _qkv_attn_savep_t_fwd
    return out, (xp, w3, qkvp, p, out if BWD_DELTA else None, bias_t,
                 mask_t)


# Phase-2 gate: run the projection backward INSIDE the backward kernel
# (dqkv never reaches HBM). Correctness-tested (equality test
# parametrized over the gate in tests/test_swin.py). Values:
#   False  — phase-1 split everywhere (bwd attention kernel + XLA
#            dx/dW/db GEMMs from its dqkv output).
#   True   — fused wherever the dW slab is COMPILABLE (see
#            _DW_SLAB_FEASIBLE below — hardware A/B measured 18.01M
#            scoped VMEM at stage 4, c=1024: the 12.6 MB resident slab
#            plus ~5.4 MB of blocks+temporaries blows the 16 MB limit,
#            so stage 4 always falls back to the phase-1 split).
#   "auto" — fused only where the in-kernel dW reduction slab
#            ([hg, c, 3·gd] f32 = 3c²·4 bytes, VMEM-resident for the
#            whole grid, one HBM write) fits the VMEM budget: Swin-B
#            stages 1-3 (c=128/256/512 → 0.2/0.8/3.1 MB) qualify;
#            stage 4 (c=1024 → 12.6 MB) would crowd out the working
#            set and stays on the phase-1 split.
# At Swin-B shapes True and "auto" therefore select the SAME per-stage
# split; the A/B that matters on hardware is False vs "auto".
# MEASURED: "auto" LOSES — dual-Swin-B joint bs32 154.37 ms vs 146.96
# phase-1 split (207.3 vs 217.7 clips/s). The resident dW slab forces
# hi-fastest grid order + halved Gb blocks, and that re-walks the
# [G,Np,C] x operand and the f32 dx scratch once per head group —
# ~2.2 MB/step-site of extra VMEM traffic that outweighs the one dqkv
# HBM round trip it saves. Default stays the phase-1 split.
FUSED_PROJECTION_BACKWARD = False

_DW_SLAB_VMEM_CAP = 4_194_304  # 4 MB ("auto" win-heuristic)
# hard compilability bound: measured blocks+temps alongside the slab are
# ~5.4 MB (stage-4 OOM forensics), so any slab past ~9 MB cannot fit the
# 16 MB scoped-VMEM limit regardless of heuristics
_DW_SLAB_FEASIBLE = 9_000_000


def _fused_bwd_wins(b, n_pad, c, Gb_fused):
    """The 'auto' policy: the resident dW slab must fit the VMEM cap
    (its HBM traffic — one slab write — always beats the phase-1 dqkv
    round trip once it fits)."""
    return 3 * c * c * 4 <= _DW_SLAB_VMEM_CAP


def _xw_attn_savep_t_bwd(static, res, dout):
    g, d, has_mask, scale, G, nw = static
    xp, w3, qkvp, p, out_res, bias_t, mask_t = res
    b, n_pad, _, c3 = qkvp.shape
    c = xp.shape[-1]
    gd = g * d
    hg = c3 // gd
    Gb = math.gcd(G, 16)  # same bwd block halving as the qkv entry
    mode = FUSED_PROJECTION_BACKWARD
    if mode == "auto":
        Gb_f = Gb
        while Gb_f > 1 and Gb_f * n_pad * c * 6 > 2_500_000:
            Gb_f //= 2
        mode = _fused_bwd_wins(b, n_pad, c, Gb_f)
    elif mode:
        # True = fused wherever compilable: the resident dW slab must
        # leave room for the block working set (stage-4 OOM measured —
        # see the gate comment)
        mode = hg * c * 3 * gd * 4 <= _DW_SLAB_FEASIBLE
    if not mode:
        # phase-1 split: unchanged attention backward kernel (the shared
        # BWD_DELTA-gated dispatch), then the projection backward as
        # plain GEMMs (same math and rounding as the replaced flax
        # Dense's autodiff: bf16 dots, f32 accumulate, round to the
        # operand dtype)
        dqkvp, dbias_t = _attn_bwd_pallas_t(qkvp, p, dout, out_res, G,
                                            n_pad, g, d, gd, nw, hg,
                                            scale)
        dq2 = dqkvp.reshape(b * n_pad, 3 * c3)
        w2 = w3.reshape(c, 3 * c3)
        dx = jax.lax.dot_general(
            dq2, w2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xp.dtype)
        dw = jax.lax.dot_general(
            xp.reshape(b * n_pad, c), dq2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(w3.dtype)
        db = jnp.sum(dqkvp.astype(jnp.float32),
                     axis=(0, 1)).astype(w3.dtype)
        return (dx.reshape(xp.shape), dw.reshape(w3.shape),
                db.reshape(3, c3), dbias_t.astype(bias_t.dtype),
                jnp.zeros_like(mask_t))
    # the x block + f32 dx scratch add Gb*Np*C*6 bytes to the backward's
    # stack — cap at 2.5 MB (stage 4: C=1024 drops Gb 16 -> 4; Gb=8
    # measured 256 KB over the 16 MB scoped limit there)
    while Gb > 1 and Gb * n_pad * c * 6 > 2_500_000:
        Gb //= 2
    dx, dwp, dbp, dbiasp = pl.pallas_call(
        functools.partial(_wa_xw_t_bwd_fused_kernel, g=g, d=d,
                          scale=scale, hg=hg),
        grid=(b // Gb, hg),  # hi FASTEST: dx accumulates across
        # consecutive head-group steps in the VMEM scratch
        in_specs=[
            pl.BlockSpec((Gb, n_pad, 3, gd), lambda i, hi: (i, 0, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gb, n_pad, g * n_pad),
                         lambda i, hi: (hi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gb, n_pad, gd), lambda i, hi: (i, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gb, n_pad, c), lambda i, hi: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3, gd), lambda i, hi: (0, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Gb, n_pad, c), lambda i, hi: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # dW slab: constant block index → VMEM-resident across the
            # WHOLE grid, one HBM write (reduction-residency pattern)
            pl.BlockSpec((hg, c, 3 * gd), lambda i, hi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, gd), lambda i, hi: (i, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad, g * n_pad),
                         lambda i, hi: (i, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            jax.ShapeDtypeStruct((hg, c, 3 * gd), jnp.float32),
            jax.ShapeDtypeStruct((b // Gb, 3, hg * gd), jnp.float32),
            jax.ShapeDtypeStruct((b // Gb, hg, n_pad, g * n_pad),
                                 jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Gb, n_pad, c), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(qkvp, p, dout, xp, w3)
    # db/dbias partial reductions (f32 accumulate, one rounding — at
    # least the precision of the phase-1 XLA GEMMs they replace); the
    # dW slab is already fully reduced in-kernel — only reorder its
    # [hg, c, 3, gd] rows into the Dense kernel's [c, 3, hg*gd] columns
    dw = dwp.reshape(hg, c, 3, gd).transpose(1, 2, 0, 3) \
        .reshape(c, 3, hg * gd).astype(w3.dtype)
    db = jnp.sum(dbp, axis=0).astype(w3.dtype)
    dbias_t = jnp.sum(dbiasp, axis=0)
    return (dx, dw, db, dbias_t.astype(bias_t.dtype),
            jnp.zeros_like(mask_t))


_xw_attn_core_savep_t.defvjp(_xw_attn_savep_t_fwd, _xw_attn_savep_t_bwd)


def _pack_bias_mask_t(bias, mask, hg, g, n, n_pad, G, dtype):
    """Transposed-layout bias/mask packing shared by the qkv and fused
    entries: bias [H, N, N] -> [HG, Np_k, g*Np_q] with padded-key rows
    -1e30; mask [nW, N, N] -> [nW, Np_k, g*Np_q] tiled over the g heads
    (or a zero block when mask is None)."""
    bp = jnp.pad(bias.reshape(hg, g, n, n),
                 ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    bp = jnp.pad(bp, ((0, 0), (0, 0), (0, 0), (0, n_pad - n)),
                 constant_values=-1e30)  # [hg, g, q_pad, k_pad]
    bias_t = bp.transpose(0, 3, 1, 2).reshape(hg, n_pad, g * n_pad)
    if mask is not None:
        mt = jnp.pad(mask, ((0, 0), (0, n_pad - n),
                            (0, n_pad - n))).transpose(0, 2, 1)
        mask_t = jnp.tile(mt, (1, 1, g))  # [nW, Np_k, g*Np_q]
    else:
        mask_t = jnp.zeros((G, n_pad, g * n_pad), dtype)
    return bias_t, mask_t


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "n_valid", "keep_pad"))
def window_attention_pallas_qkv_fused(x, w, bvec, bias,
                                      mask: Optional[jnp.ndarray],
                                      num_heads: int,
                                      scale: Optional[float] = None,
                                      n_valid: Optional[int] = None,
                                      keep_pad: bool = False):
    """window_attention_pallas_qkv with the qkv PROJECTION fused into the
    forward kernel (see the fused-GEMM section comment for why — layout-
    conversion copies, not FLOPs).

    x: [B, Np, C] pre-padded token stream (the LayerNorm output; pad rows
    may be garbage — padded keys are masked by the -1e30 bias columns and
    pad-row gradients are exactly zero, same contract as the pre-padded
    qkv entry). w: [C, 3C] Dense kernel (column order [3, H, dh], i.e.
    the flax Dense the XLA path uses — pass it pre-cast to the compute
    dtype). bvec: [3C]. Returns [B, n_valid, C].

    Only the save_p + transposed (training-default) variant exists here;
    eval and off-TPU use the XLA path as before."""
    b, n_p, c = x.shape
    n = n_valid if n_valid is not None else n_p
    d = c // num_heads
    scale = scale if scale is not None else d ** -0.5
    h = num_heads
    g = max(1, min(h, 128 // d))
    while h % g:
        g -= 1
    hg = h // g
    gd = g * d
    n_pad = _round_up(n, 8)
    if n_p != n_pad:
        raise ValueError(f"x has {n_p} tokens, expected {n_pad} "
                         f"for n_valid={n}")

    if mask is not None:
        nw = mask.shape[0]
        if b % nw:
            raise ValueError(f"windows {b} not a multiple of nW {nw}")
        G = math.gcd(nw, 32)
    else:
        nw = 1
        G = 32
        while b % G:
            G //= 2
        G = max(G, 1)
    # the in-kernel GEMM adds the [G, Np, C] x block (and its f32 dot
    # accumulator) to the forward's VMEM stack: G=32 at C=1024 (stage 4)
    # overflowed scoped vmem by 444 KB (16.43M/16M measured) — cap the
    # block so the x operand stays <= 2.5 MB. Halving keeps G dividing
    # nW (mask chunk alignment).
    while G > 1 and G * n_pad * c * 2 > 2_500_000:
        G //= 2

    bias_t, mask_t = _pack_bias_mask_t(bias, mask, hg, g, n, n_pad, G,
                                       x.dtype)
    static = (g, d, mask is not None, scale, G, nw)
    w3 = w.reshape(c, 3, h * d)
    bv = bvec.reshape(3, h * d)
    out = _xw_attn_core_savep_t(static, x, w3, bv, bias_t, mask_t)
    # keep_pad: return the [B, n_pad, C] kernel output unsliced so the
    # caller can run its projection GEMM straight off the kernel buffer
    # and slice afterwards (pad rows carry garbage values but exactly-zero
    # cotangents — the downstream slice's vjp zero-pads them — so dW/dx
    # are unchanged; proj-boundary A/B, benchmarks/run_all.py)
    return out if keep_pad else out[:, :n]


@functools.partial(jax.jit, static_argnames=("num_heads", "scale",
                                             "n_valid"))
def window_attention_pallas_qkv_fused_eval(x, w, bvec, bias,
                                           mask: Optional[jnp.ndarray],
                                           num_heads: int,
                                           scale: Optional[float] = None,
                                           n_valid: Optional[int] = None):
    """Inference variant of window_attention_pallas_qkv_fused: same
    contract (pre-padded x, Dense kernel/bias operands, [B, n_valid, C]
    out) but forward-ONLY — no p/qkv residual writes (the save-p
    residuals are what made the training kernel LOSE pure-forward eval
    to XLA, 16.8 vs 14.57 ms dual Swin-B). NOT differentiable (no vjp
    registered); callers gate it to eval. Same block plan as the
    training entry (the prologue mirrors it line-for-line)."""
    b, n_p, c = x.shape
    n = n_valid if n_valid is not None else n_p
    d = c // num_heads
    scale = scale if scale is not None else d ** -0.5
    h = num_heads
    g = max(1, min(h, 128 // d))
    while h % g:
        g -= 1
    hg = h // g
    gd = g * d
    n_pad = _round_up(n, 8)
    if n_p != n_pad:
        raise ValueError(f"x has {n_p} tokens, expected {n_pad} "
                         f"for n_valid={n}")

    if mask is not None:
        nw = mask.shape[0]
        if b % nw:
            raise ValueError(f"windows {b} not a multiple of nW {nw}")
        G = math.gcd(nw, 32)
    else:
        nw = 1
        G = 32
        while b % G:
            G //= 2
        G = max(G, 1)
    while G > 1 and G * n_pad * c * 2 > 2_500_000:
        G //= 2

    bias_t, mask_t = _pack_bias_mask_t(bias, mask, hg, g, n, n_pad, G,
                                       x.dtype)
    specs = _qkv_t_specs(G, n_pad, g, gd, nw)
    out = pl.pallas_call(
        functools.partial(_wa_xw_t_eval_kernel, g=g, d=d,
                          has_mask=mask is not None, scale=scale),
        grid=(hg, b // G),
        in_specs=[
            pl.BlockSpec((G, n_pad, c), lambda hi, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3, gd), lambda hi, i: (0, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, gd), lambda hi, i: (0, hi),
                         memory_space=pltpu.VMEM),
            specs["bias"], specs["mask"],
        ],
        out_specs=specs["out"],
        out_shape=jax.ShapeDtypeStruct((b, n_pad, hg * gd), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, w.reshape(c, 3, h * d), bvec.reshape(3, h * d), bias_t, mask_t)
    return out[:, :n]


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "save_p",
                                    "transposed", "n_valid"))
def window_attention_pallas_qkv(qkv, bias, mask: Optional[jnp.ndarray],
                                num_heads: int,
                                scale: Optional[float] = None,
                                save_p: bool = True,
                                transposed: bool = True,
                                n_valid: Optional[int] = None):
    """Packed-head Pallas attention fed DIRECTLY with the qkv projection
    output — [B, N, 3, C] (the reshape of the Dense's [B, N, 3C]) — and
    returning [B, N, C]. The head split never materializes in HBM: the
    qkv Dense's column order [3, H, dh] already has each head-group's
    gd(=128) lanes contiguous and the kernel addresses each head group as
    a 128-lane block — the only host-side data movement is the N->Np pad,
    and even that vanishes when the caller pre-pads: pass `n_valid=N`
    with qkv already [B, Np, 3, C] (Np = N rounded up to 8) and the qkv
    projection GEMM writes the kernel's padded operand directly — the
    0.2-0.3 ms/site HBM round trip of padding the 3C-wide projection
    output is replaced by padding the C-wide token stream BEFORE the
    projection, where the pad fuses into the LayerNorm producer fusion
    (padded rows are masked out of the keys by the -1e30 bias columns
    either way, so valid outputs are bit-identical).
    Differentiable: the backward pass is a second Pallas
    kernel: with `save_p` (default) the forward stores the softmax
    probabilities as a residual (saved in the input dtype — bf16
    under bf16 training) and the backward skips the score
    recompute (_wa_qkv_bwd_p_kernel); save_p=False selects the flash-style
    recompute backward (_wa_qkv_bwd_kernel)."""
    b, n, three, c = qkv.shape
    assert three == 3
    if n_valid is not None:
        n = n_valid
    d = c // num_heads
    scale = scale if scale is not None else d ** -0.5
    h = num_heads
    g = max(1, min(h, 128 // d))
    while h % g:
        g -= 1
    hg = h // g
    gd = g * d
    # Token-dim rounding to 8 sublanes. An unpadded (Np=49) variant was
    # tried and is a recorded NEGATIVE: Mosaic accepts the 49-sized blocks
    # but its stack allocation grows past the 16 MB scoped-vmem limit at
    # G=32 (fails by 252 KB), and the G=16 fallback costs more than the
    # pad copies it saves (177.8 vs the then-current 185.4 clips/s full
    # train step; the round-3 TRANSPOSED unpadded variant also lost —
    # see the dispatcher note below).
    n_pad = _round_up(n, 8)

    if mask is not None:
        nw = mask.shape[0]
        if b % nw:
            raise ValueError(f"windows {b} not a multiple of nW {nw}")
        G = math.gcd(nw, 32)  # divides nW (mask chunk alignment), <= 32
    else:
        nw = 1
        G = 32
        while b % G:
            G //= 2
        G = max(G, 1)

    # natural layout straight from the projection: [B, Np, 3, C]. The
    # head-group axis is addressed as a 128-lane block inside the kernel
    # (lane block index hi), so NO transpose exists at any head count —
    # the earlier hg-leading layout cost a real copy per stage-2/3/4 site.
    # Unpadded (Np=49) transposed blocks are LEGAL (every non-aligned
    # block dim equals its array dim) and compile — but measured a LOSS:
    # 164.8 ms vs 159.1 on the dual-Swin-B joint step (Mosaic's 49-sublane
    # tilings cost more than the ~96 HBM pad/slice copies they remove).
    # Token padding stays for both score layouts; the row-layout unpadded
    # variant additionally overflows scoped vmem (round-2 negative).
    if n_valid is not None:
        if qkv.shape[1] != n_pad:
            raise ValueError(
                f"pre-padded qkv has {qkv.shape[1]} tokens, expected "
                f"{n_pad} for n_valid={n_valid}")
        qkvp = qkv
    else:
        qkvp = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
    # fold the padded-KEY masking into the bias (padded keys get -1e30)
    # so the kernels skip a full score-sized iota+where in the forward AND
    # the recompute backward; padded-row softmaxes stay finite (their
    # valid columns are 0 + bias) and their dout is zero either way.
    bp = jnp.pad(bias.reshape(hg, g, n, n),
                 ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    bp = jnp.pad(bp, ((0, 0), (0, 0), (0, 0), (0, n_pad - n)),
                 constant_values=-1e30)  # [hg, g, q_pad, k_pad]

    static = (g, d, mask is not None, scale, G, nw)
    if save_p and transposed:
        # transposed-score layout (keys in sublanes): same inputs, but
        # bias/mask are packed as [.., Np_k, g*Np_q]. Autodiff through
        # this packing maps the kernel's transposed dbias back to the
        # caller's [H, N, N] bias automatically.
        bias_t = bp.transpose(0, 3, 1, 2).reshape(hg, n_pad, g * n_pad)
        if mask is not None:
            mt = jnp.pad(mask, ((0, 0), (0, n_pad - n),
                                (0, n_pad - n))).transpose(0, 2, 1)
            mask_t = jnp.tile(mt, (1, 1, g))  # [nW, Np_k, g*Np_q]
        else:
            mask_t = jnp.zeros((G, n_pad, g * n_pad), qkv.dtype)
        out = _qkv_attn_core_savep_t(static, qkvp, bias_t, mask_t)
        return out[:, :n]

    bias_p = bp.reshape(hg, g * n_pad, n_pad)
    if mask is not None:
        mask_p = jnp.pad(mask, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
    else:
        mask_p = jnp.zeros((G, n_pad, n_pad), qkv.dtype)
    core = _qkv_attn_core_savep if save_p else _qkv_attn_core
    out = core(static, qkvp, bias_p, mask_p)  # [B, Np, C]
    return out[:, :n]


def window_attention(q, k, v, bias, mask=None, scale=None,
                     use_pallas: bool = False):
    """Convenience dispatcher over the [B, H, N, D] implementations (the
    models use the qkv-direct / bnhd forms directly; this is the stable
    entry point for external callers and notebooks)."""
    if use_pallas:
        return window_attention_pallas_packed(q, k, v, bias, mask, scale)
    return window_attention_xla(q, k, v, bias, mask, scale)
