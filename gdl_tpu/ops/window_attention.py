"""Fused window attention for Swin — the TPU stand-in for the reference's
optional CUDA window-process kernel (models/swin_transformer.py:13-23,
absent in the reference snapshot and falling back to pure PyTorch).

Two interchangeable implementations, verified equal in tests:
  - `window_attention_xla`: plain jnp — XLA already fuses the bias add +
    mask + softmax chain into the two batched matmuls, which at Swin's
    49-token windows keeps everything resident in VMEM.
  - `window_attention_pallas`: a Pallas kernel that keeps one block of
    windows' q/k/v in VMEM and does qkᵀ → +bias/mask → softmax → ·v in a
    single pass (no HBM roundtrip between the matmuls even across fusion
    boundaries XLA declines to cross). Tokens are padded to the sublane
    multiple; the pad is masked out of the softmax.

Inputs:
  q, k, v: [B, H, N, D]   (B = batch·windows, H heads, N tokens, D head dim)
  bias:    [H, N, N]      relative-position bias
  mask:    [nW, N, N] or None — shifted-window mask (0 / -100), tiled over
           B in blocks of nW (swin_transformer.py WindowAttention.forward)
Returns [B, H, N, D].
"""

from __future__ import annotations

import functools
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


def window_attention(q, k, v, bias, mask=None, scale=None,
                     use_pallas: bool = False):
    if use_pallas:
        return window_attention_pallas(q, k, v, bias, mask, scale)
    return window_attention_xla(q, k, v, bias, mask, scale)
