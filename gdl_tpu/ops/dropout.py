"""Pallas dropout-mask generator for the transformer stacks.

XLA lowers each `nn.Dropout` (reference lib Transformer.py:54-96's four
dropout sites) as RngBitGenerator -> u32-vs-threshold compare -> a
materialized pred mask that both the forward multiply and the backward
multiply read (the mask CANNOT be fused away: fwd and bwd must see the
same bits, and XLA will not re-run an RNG op). At mmformer bs64 that
pipeline — a 411 MB u32 rbg write, a 411 MB compare read, a pred write,
per 4096-wide hidden mask per fusion pass — profiled at ~8 ms of the
85 ms step (rng-bit-generator 4.1 ms + maximum_compare/pred fusions).

This op generates the {0, 1/(1-rate)} mask DIRECTLY with the in-kernel
Mosaic PRNG (pltpu.prng_seed + prng_random_bits, the ops/self_attention
'kernel'-impl machinery) and writes only the final mask array. Consumers
are unchanged — the mask is still a materialized HBM array that XLA
fuses into the neighboring GEMM epilogues exactly as it fused the pred
mask, and fwd/bwd still read the same array, so no custom vjp is needed.

Mask bits differ from jax.random.bernoulli (different PRNG); the keep
probability is exact to 2^-32 — the same implementation-defined-bits
class of change as cfg.fast_dropout_rng. TPU-only: the Mosaic PRNG has
no interpret lowering, so off-TPU `dropout()` replays flax nn.Dropout's
exact bernoulli math (bitwise-identical to nn.Dropout on the same rng).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdl_tpu.ops.self_attention import _fold_seed_words

# module-level switch (read at trace time) so tests can force the XLA
# path on TPU; mirrors transformer.SA_DROPOUT_IMPL
DROPOUT_MASK_IMPL = "kernel"


def _mask_kernel(seed_ref, o_ref, *, keep_thresh, inv_keep):
    i = pl.program_id(0)
    # golden-ratio odd-constant mixing: distinct blocks draw distinct
    # streams from the two folded key words (self_attention.py scheme)
    pltpu.prng_seed(seed_ref[0] ^ (i * jnp.int32(-1640531527)),
                    seed_ref[1] ^ (i * jnp.int32(1013904223)))
    bits = pltpu.prng_random_bits(o_ref.shape)
    # i32 -> u32 bitcast REQUIRED: a signed compare halves the keep rate
    ubits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    keep = (ubits < jnp.uint32(keep_thresh)).astype(jnp.float32)
    o_ref[...] = (keep * jnp.float32(inv_keep)).astype(o_ref.dtype)


def _row_block(m: int, c: int) -> int:
    """Largest divisor of m that is a multiple of 8 with the block's
    u32-bits + f32-keep + output temps well under scoped VMEM: ~3-4
    block-sized arrays live (bits, keep, scaled, converted out), so cap
    one array at 4 MB (hardware-measured fine at 3.7 MB blocks)."""
    cap = max(8, (4 * 2 ** 20) // (4 * c))
    t = min(m, cap) // 8 * 8
    while t > 8 and m % t:
        t -= 8
    return max(t, 8)


@functools.partial(jax.jit, static_argnames=("shape", "rate", "dtype"))
def prng_dropout_mask(rng: jax.Array, shape: tuple, rate: float,
                      dtype=jnp.float32) -> jnp.ndarray:
    """The {0, 1/(1-rate)} dropout mask of `shape`, generated in-kernel.

    TPU only (callers gate); requires last dim % 128 == 0 and the
    flattened leading dims % 8 == 0 (all transformer sites qualify:
    [B, N, 4096] / [B, N, 512])."""
    c = shape[-1]
    m = 1
    for s in shape[:-1]:
        m *= s
    assert c % 128 == 0 and m % 8 == 0, shape
    keep_thresh = min(int(round((1.0 - rate) * 2 ** 32)), 2 ** 32 - 1)
    t = _row_block(m, c)
    mask = pl.pallas_call(
        functools.partial(_mask_kernel, keep_thresh=keep_thresh,
                          inv_keep=1.0 / (1.0 - rate)),
        grid=(m // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), dtype),
    )(_fold_seed_words(rng))
    return mask.reshape(shape)


def dropout(x: jnp.ndarray, rate: float, rng: jax.Array) -> jnp.ndarray:
    """Train-time dropout on x. On TPU (and DROPOUT_MASK_IMPL='kernel',
    shape permitting) the mask comes from the Pallas generator;
    otherwise this is exactly flax nn.Dropout's bernoulli math."""
    if rate == 0.0:
        return x
    c = x.shape[-1]
    m = x.size // c
    from gdl_tpu.ops import dropout as _self  # live module flag

    if (_self.DROPOUT_MASK_IMPL == "kernel"
            and jax.default_backend() == "tpu"
            and c % 128 == 0 and m % 8 == 0):
        return x * prng_dropout_mask(rng, x.shape, rate, x.dtype)
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jax.lax.select(keep, x / (1.0 - rate), jnp.zeros_like(x))
