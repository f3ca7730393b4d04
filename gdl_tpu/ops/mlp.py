"""Fused transformer-MLP (fc1 + exact GELU + fc2) Pallas kernel.

The transformer MLP (SwinBlock mlp_fc1/mlp_fc2 — reference
models/swin_transformer.py's Mlp, :64-80; same shape in the mmformer
stack's FeedForward) lowers in XLA as two separate GEMMs with the
4C-wide intermediate round-tripping HBM between them (fc1 writes h,
gelu reads h / writes g, fc2 reads g). At swin stage shapes these GEMMs
are contraction-shallow (K = C = 128..512) and measure 14-22 TFLOP/s on
v5e regardless of emitter (6D dense vs flat 2D is a wash); one Pallas
kernel that streams M-row blocks and keeps the whole fc1->gelu->fc2
chain VMEM-resident measured 1.18-1.32x on the isolated stage shapes
at blk 2048 (benchmarks/RESULTS.md round 4).

DISPOSITION (round-4 hardware A/B): gated OFF by default. The winning
blk-2048 configuration overflows the Mosaic scoped-vmem stack inside
the full swin step (17.61 MB against the 16 MB limit — the stack runs
~4.4x the naive f32 intermediate), and the swin stage M values' divisor
structure (M = 2^k * 49) offers no block between the VMEM-feasible
1024/512/224 and the overflowing 1792/784/392, so the recalibrated
kernel is the only in-model option — and it measures a WASH/slight loss
on the full dual-Swin-B joint step (215.3 vs 217.3 clips/s bs32,
148.66 vs 147.26 ms). The isolated win does not survive smaller blocks
plus XLA's own gelu-into-GEMM fusion in the baseline. Kernel + tests
stay for re-measurement on parts with bigger VMEM.

Backward (training) is the recompute pattern: the forward kernel saves
NOTHING score-sized — the custom_vjp backward re-derives h and g from
the inputs with plain XLA ops and takes standard GEMM gradients. That
trades one extra fc1-sized GEMM in the backward for the forward's h/g
HBM round trips plus the residual storage XLA would otherwise carry
between forward and backward.

GELU inside the kernel is the Abramowitz & Stegun 7.1.26 erf
approximation (max abs err 1.5e-7 — Mosaic has no erf primitive); the
XLA reference/backward path uses jax.nn.gelu(approximate=False). The
forward/backward mismatch this introduces is ~1e-7 absolute, three
orders of magnitude under bf16 resolution.

Block support: C and 4C must be lane-aligned (multiples of 128) and the
weights must fit VMEM (rules out Swin-B stage 3, C=1024: 16.8 MB of
bf16 weights — measured Mosaic scoped-vmem failure; stage 3 is 4 of 48
block instances and stays XLA). Unsupported shapes fall back to the XLA
chain, exactly like sa_kernel_supported gating elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf_as(x):
    """Abramowitz & Stegun 7.1.26 erf (max abs err 1.5e-7), f32 in/out."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    return x * 0.5 * (1.0 + _erf_as(x * (2.0 ** -0.5)))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    # fc1 in f32 accumulation, h rounded to the compute dtype before the
    # gelu (mirrors the XLA chain, where fc1's output array IS compute
    # dtype), gelu evaluated in f32, g rounded back for the fc2 MXU pass.
    h = jnp.dot(x_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32)
    h = (h + b1_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    g = _gelu_f32(h.astype(jnp.float32)).astype(x_ref.dtype)
    o = jnp.dot(g, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def mlp_ref(x, w1, b1, w2, b2):
    """The plain-XLA chain with the kernel's exact dtype staging; also
    the backward's recompute source. Matches nn.Dense->gelu->nn.Dense to
    f32 GEMM reassociation noise."""
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = (h + b1.astype(jnp.float32)).astype(x.dtype)
    g = jax.nn.gelu(h.astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    o = jnp.dot(g, w2, preferred_element_type=jnp.float32)
    return (o + b2.astype(jnp.float32)).astype(x.dtype)


def _largest_divisor_block(m: int, cap: int) -> int:
    """Largest divisor of m that is a multiple of 8 and <= cap (0 if
    none >= 64 exists — tiny/prime M falls back to XLA)."""
    best = 0
    d = 1
    while d * d <= m:
        if m % d == 0:
            for cand in (d, m // d):
                if cand % 8 == 0 and cand <= cap and cand > best:
                    best = cand
        d += 1
    return best if best >= 64 else 0


def pick_m_block(m: int, c: int, h: int, itemsize: int) -> int:
    """Choose the M-block, or 0 = unsupported. VMEM model calibrated on
    v5e hardware: the Mosaic scoped-vmem STACK runs ~4.4x the naive f32
    intermediate (blk 2048 @ H=512 measured 17.61 MB of stack against
    the 16 MB limit inside the full swin step — the gelu chain holds
    several h-sized f32 temps), so the f32 intermediate is budgeted at
    2.5 MB (stack ~11 MB, 5 MB margin; blk 392 @ H=2048 = 14.1 MB stack
    compiled standalone but leaves no in-model headroom). Weights are
    grid-invariant operands (not stack) and must fit 10 MB — rules out
    Swin-B stage 3 (16.8 MB bf16)."""
    if c % 128 or h % 128:
        return 0
    weights = 2 * c * h * itemsize
    if weights > 10 * 1024 * 1024:
        return 0
    cap = (640 * 1024) // h
    return _largest_divisor_block(m, min(cap, 4096))


def mlp_kernel_supported(m: int, c: int, h: int, itemsize: int) -> bool:
    return pick_m_block(m, c, h, itemsize) > 0


def _mlp_pallas_raw(x, w1, b1, w2, b2, interpret: bool):
    m, c = x.shape
    h = w1.shape[1]
    blk = pick_m_block(m, c, h, x.dtype.itemsize)
    assert blk > 0, (m, c, h)
    return pl.pallas_call(
        _mlp_kernel,
        grid=(m // blk,),
        in_specs=[
            pl.BlockSpec((blk, c), lambda i: (i, 0)),
            pl.BlockSpec((c, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((h, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=interpret,
    )(x, w1, b1.reshape(1, h), w2, b2.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _mlp_fused(x, w1, b1, w2, b2, interpret):
    return _mlp_pallas_raw(x, w1, b1, w2, b2, interpret)


def _mlp_fwd(x, w1, b1, w2, b2, interpret):
    return _mlp_pallas_raw(x, w1, b1, w2, b2, interpret), (x, w1, b1,
                                                           w2, b2)


def _mlp_bwd(interpret, res, dy):
    # Recompute-backward in plain XLA: h/g were never written to HBM by
    # the forward, so re-derive them here (one fc1 GEMM + gelu) and take
    # the standard chain gradients via jax.vjp of the reference chain.
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(mlp_ref, x, w1, b1, w2, b2)
    return vjp(dy)


_mlp_fused.defvjp(_mlp_fwd, _mlp_bwd)


def mlp_fused(x, w1, b1, w2, b2, *, interpret: bool = False):
    """Fused MLP over 2D [M, C] tokens. Falls back to the XLA chain when
    the shape is unsupported (see pick_m_block) — callers gate on
    backend themselves (swin.is_tpu_backend pattern) and pass
    interpret=True only in CPU kernel tests."""
    m, c = x.shape
    if not mlp_kernel_supported(m, c, w1.shape[1], x.dtype.itemsize):
        return mlp_ref(x, w1, b1, w2, b2)
    # off-TPU the Mosaic kernel only has the interpret path (CPU model
    # tests drive the gated branch with is_tpu_backend monkeypatched)
    interpret = interpret or jax.default_backend() != "tpu"
    return _mlp_fused(x, w1, b1, w2, b2, interpret)
