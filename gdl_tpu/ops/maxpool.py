"""Pallas maxpool backward for the ResNet stems (torch
MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC).

XLA autodiffs max_pool through select-and-scatter, the last named
multi-ms op family on the flagship profile (1.73 ms/step across the two
stems, ~7%) and ~3x off its HBM roofline (one x read + one dx write +
one cotangent read is ~230 MB at the visual-stem shape). Both XLA-level
rewrites are recorded NEGATIVES (benchmarks/ab_maxpool_bwd.py: strided
.at[].add scatters 35.8 ms, interior-padded dilation pads 41.8 ms vs
2.61 ms fwd+bwd for select-and-scatter) — the placement ops don't fuse
and each materializes input-sized intermediates. This kernel does the
whole backward in VMEM per image: x is read once, dx written once, and
the nine window views never touch HBM.

Semantics: gradient to the FIRST maximal element of each window in
row-major order, ties included — identical to XLA select-and-scatter
and torch (asserted against the autodiff rule in tests/test_ops.py).

The stride-2 geometry is handled by PHASE DECOMPOSITION: split H and W
into even/odd phases, so every one of the nine window views is a +/-1
shift of one of the four (H-phase, W-phase) arrays, and the gradient
placement back onto the input grid re-interleaves four phase
accumulators. Hardware-probed Mosaic constraints shaped the interleave
(bf16, this toolchain): LANE-PRESERVING sublane regroups compile
([h2,2w2,c] <-> [hp,w2,c], [h,w,c] <-> [h2,2,w2,2,c]) but the
lane-splitting cast [h2,w2,2c] -> [h2,wp,c] does not
('infer-vector-layout: unsupported shape cast'), and strided ref
loads/stores exist only for 32-bit data ('not implemented: Strided
load with non 32-bit data'). So: the H interleave runs in-kernel as a
concat + sublane regroup, and the W interleave is LANE-PACKED — the
kernel writes dx as [h, wo, 2c] with the two W phases side by side in
lanes, and the caller's row-major reshape [b,h,wo,2c] -> [b,h,2*wo,c]
(a free XLA bitcast, fused into the consumer) finishes the job. No
gather, no scatter anywhere.

Reference slot: the maxpool inside every torchvision-style stem the
reference instantiates (models/backbone.py resnet18 conv1/maxpool).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _neg_inf(dtype):
    return jnp.asarray(-jnp.inf if jnp.issubdtype(dtype, jnp.floating)
                       else jnp.iinfo(dtype).min, dtype)


def _shift_m1(arr, axis, fill):
    """arr shifted so out[i] = arr[i-1] along axis (out[0] = fill)."""
    pad_shape = list(arr.shape)
    pad_shape[axis] = 1
    pad = jnp.full(pad_shape, fill, arr.dtype)
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(0, arr.shape[axis] - 1)
    return jnp.concatenate([pad, arr[tuple(sl)]], axis=axis)


def _shift_p1(arr, axis):
    """arr shifted so out[i] = arr[i+1] along axis (out[-1] = 0)."""
    pad_shape = list(arr.shape)
    pad_shape[axis] = 1
    pad = jnp.zeros(pad_shape, arr.dtype)
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(1, arr.shape[axis])
    return jnp.concatenate([arr[tuple(sl)], pad], axis=axis)


def _mp_bwd_kernel(x_ref, g_ref, dxp_ref, *, h, w):
    """One image per grid step. Blocks: x [1, H, W, C]; g [1, ho, wo, C];
    dxp [1, H, wo, 2C] — dx with the two W phases lane-packed
    (dxp[i, b, pj*C + k] = dx[i, 2b + pj, k])."""
    x = x_ref[0]
    g = g_ref[0]
    neg = _neg_inf(x.dtype)
    hp = h + (h % 2)
    wp = w + (w % 2)
    if hp != h:
        x = jnp.concatenate(
            [x, jnp.full((1, w, x.shape[-1]), neg, x.dtype)], axis=0)
    if wp != w:
        x = jnp.concatenate(
            [x, jnp.full((hp, 1, x.shape[-1]), neg, x.dtype)], axis=1)
    h2, w2, c = hp // 2, wp // 2, x.shape[-1]

    # phase split: q[pi][pj][a, b] = x[2a + pi, 2b + pj]
    # (lane-preserving sublane-regroup reshape, Mosaic-legal)
    xq = x.reshape(h2, 2, w2, 2, c)
    q = [[xq[:, 0, :, 0], xq[:, 0, :, 1]],
         [xq[:, 1, :, 0], xq[:, 1, :, 1]]]

    # view(di, dj)[a, b] = x[2a + di - 1, 2b + dj - 1] (-inf off-grid):
    # row phase 0 iff di == 1 (shift -1 iff di == 0), same for columns
    def view(di, dj):
        v = q[0 if di == 1 else 1][0 if dj == 1 else 1]
        if di == 0:
            v = _shift_m1(v, 0, neg)
        if dj == 0:
            v = _shift_m1(v, 1, neg)
        return v

    views = [view(di, dj) for di in range(3) for dj in range(3)]
    m = views[0]
    for v in views[1:]:
        m = jnp.maximum(m, v)
    # the tie test runs in f32 (exact for bf16 values): the VPU has no
    # bf16 compare ('Target does not support this comparison'), and
    # v <= m always holds so v >= m is the equality
    mf = m.astype(jnp.float32)

    # first-max-in-row-major-order take, then place each contribution on
    # the (pi, pj) input phase it came from: window (oi, oj) offset
    # (di, dj) touched input row 2*oi + di - 1 = 2a + pi with
    # oi = a + (1 iff di == 0), so the phase accumulator adds the
    # contribution shifted +1 for di == 0 (and unshifted for di == 2);
    # di == 1 lands on the even phase unshifted.
    zero = jnp.zeros((), g.dtype)
    count = jnp.zeros(m.shape, jnp.int32)
    acc = [[None, None], [None, None]]
    for di in range(3):
        for dj in range(3):
            v = views[di * 3 + dj]
            eq = v.astype(jnp.float32) >= mf
            take = jnp.logical_and(eq, count == 0)
            count = count + eq.astype(jnp.int32)
            contrib = jnp.where(take, g, zero)
            if di == 0:
                contrib = _shift_p1(contrib, 0)
            if dj == 0:
                contrib = _shift_p1(contrib, 1)
            pi = 0 if di == 1 else 1
            pj = 0 if dj == 1 else 1
            acc[pi][pj] = (contrib if acc[pi][pj] is None
                           else acc[pi][pj] + contrib)

    # re-interleave: per W phase, the H interleave is a concat on axis 1
    # ([h2, 2*w2, c] element (a, pi*w2 + b, k)) + the Mosaic-legal
    # sublane-regroup reshape to [hp, w2, c] (element (2a + pi, b, k));
    # the W interleave rides the LANES (concat the two phases on C) and
    # is finished by the caller's free row-major bitcast. Rows past the
    # input extent (odd h) are cropped here; the odd-w garbage column
    # lives at packed position 2*b + 1 = w and is cropped by the caller.
    outs = []
    for pj in range(2):
        t = jnp.concatenate([acc[0][pj], acc[1][pj]], axis=1)
        outs.append(t.reshape(hp, w2, c)[:h])
    dxp_ref[0] = jnp.concatenate(outs, axis=-1).astype(dxp_ref.dtype)


@jax.custom_vjp
def max_pool_3x3_s2_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """nn.max_pool(3x3, stride 2, pad 1) with the Pallas backward above.
    Forward stays XLA's reduce_window (fused, cheap); only the backward
    select-and-scatter is replaced."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


def _mp_fwd(x):
    m = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    return m, x


def _mp_bwd(res, g):
    x = res
    b, h, w, c = x.shape
    ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    dxp = pl.pallas_call(
        functools.partial(_mp_bwd_kernel, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wo, 2 * c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wo, 2 * c), g.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, g)
    # free row-major bitcast finishing the lane-packed W interleave
    # (dxp[i, j, b, pj*c + k] -> dx[i, j, 2b + pj, k]), then the odd-w
    # garbage column (packed position w) is cropped
    return (dxp.reshape(b, h, 2 * wo, c)[:, :, :w, :],)


max_pool_3x3_s2_pallas.defvjp(_mp_fwd, _mp_bwd)
