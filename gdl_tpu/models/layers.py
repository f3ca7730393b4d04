"""Shared layer building blocks and weight-init parity helpers.

The reference applies `utils/utils.py:15-23 weight_init` to the whole model
after construction (main_dgl.py:238), overriding any module-local init:
  - nn.Linear: xavier_normal weight, zero bias
  - nn.Conv2d: kaiming_normal fan_out (relu) weight
  - nn.BatchNorm2d: weight 1, bias 0
The initializers below reproduce those distributions in Flax conventions
(Flax Dense kernels are [in, out]; glorot is symmetric so the variance
matches torch's [out, in]).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch.nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu'):
# std = sqrt(2 / fan_out), normal distribution.
conv_kaiming_init = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)

# torch.nn.init.xavier_normal_: std = sqrt(2 / (fan_in + fan_out)), normal.
dense_xavier_init = nn.initializers.glorot_normal()


class TorchLinear(nn.Module):
    """nn.Dense with the reference's xavier-normal / zero-bias init."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=dense_xavier_init,
            bias_init=nn.initializers.zeros,
            name="linear",
        )(x)


def conv(features: int, kernel: int, stride: int = 1, dtype: Any = jnp.float32,
         name: str | None = None) -> nn.Conv:
    """Bias-free conv with torch-style 'same-ish' explicit padding.

    torch Conv2d(k, stride s, padding p) pads p on both sides; for the
    ResNet convs p = k // 2, which equals Flax padding [(p, p), (p, p)].
    """
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        dtype=dtype,
        kernel_init=conv_kaiming_init,
        name=name,
    )


class GroupedBatchNorm(nn.Module):
    """Per-replica BatchNorm — torch DataParallel semantics under ONE jit
    program (SURVEY §7 hard part 3, cfg.sync_bn=0).

    DataParallel scatters the batch into `groups` contiguous chunks and
    each replica normalizes with ITS chunk's statistics; running stats keep
    only replica 0's updates (the well-known DP BN quirk). Reproduced here
    by reshaping [B, ...] -> [groups, B/groups, ...] and normalizing per
    group — with the batch sharded contiguously over the 'data' mesh axis
    and groups == dp, each group's reduction stays device-local (no
    collective), exactly like DP. Running-var updates use torch's UNBIASED
    batch variance (n/(n-1)), unlike flax's nn.BatchNorm.
    """

    groups: int
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((features,), jnp.float32))

        if self.use_running_average:
            # x stays in its storage dtype; subtracting the f32 mean
            # promotes elementwise inside one fusion (no f32 copy of x).
            y = (x - ra_mean.value) * jax.lax.rsqrt(
                ra_var.value + self.epsilon)
        else:
            g = self.groups
            b = x.shape[0]
            if b % g != 0:
                raise ValueError(
                    f"batch {b} not divisible into {g} BN groups (per-"
                    f"replica BN needs batch_size % dp == 0)")
            xg = x.reshape((g, b // g) + x.shape[1:])
            red = tuple(range(1, xg.ndim - 1))  # all but group & channel
            # One-pass E[x^2]-E[x]^2 statistics with f32 accumulation (the
            # flax _compute_stats pattern): both reductions fuse into a
            # SINGLE read of x in its storage dtype. The earlier
            # x.astype(f32) + two-pass jnp.var cost three passes over a
            # materialized f32 copy and regressed the flagship step ~9%
            # (BENCH_r04; VERDICT r4 item 1).
            # Numerics note: E[x²]-E[x]² in f32 loses precision when
            # |mean|/std approaches sqrt(1/ulp) ≈ 3e3 (then mean² swamps
            # the variance). Unreachable for BN'd activations in practice;
            # a running-mean-shifted variant (E[(x-c)²]-(mean-c)²) fixes
            # the tail for free but perturbs rounding enough to leave the
            # chaos-calibrated 25-step trajectory-parity envelope
            # (test_trajectory_parity) — rejected for the parity surface.
            xf = xg.astype(jnp.float32)
            mean_g = jnp.mean(xf, axis=red)            # [g, C]
            mean2_g = jnp.mean(jnp.square(xf), axis=red)
            var_g = jnp.maximum(                       # biased (normalize)
                mean2_g - jnp.square(mean_g), 0.0)
            shape = (g,) + (1,) * (xg.ndim - 2) + (features,)
            y = (xg - mean_g.reshape(shape)) * jax.lax.rsqrt(
                var_g.reshape(shape) + self.epsilon)
            y = y.reshape(x.shape)
            if not self.is_initializing():
                n = 1
                for ax in red:
                    n *= xg.shape[ax]
                unbias = n / max(n - 1, 1)
                m = self.momentum
                # replica 0's stats only (DataParallel keeps device 0's)
                ra_mean.value = m * ra_mean.value + (1 - m) * mean_g[0]
                ra_var.value = m * ra_var.value + (1 - m) * (var_g[0]
                                                             * unbias)
        return (y * scale + bias).astype(self.dtype)


def batch_norm(train: bool, dtype: Any = jnp.float32,
               name: str | None = None, groups: int = 1):
    """BatchNorm matching torch defaults: eps 1e-5, running-stat momentum 0.1
    (Flax momentum = 1 - 0.1 = 0.9), scale init 1, bias init 0.

    groups > 1 selects per-replica (DataParallel-semantics) statistics —
    see GroupedBatchNorm; groups == 1 is global-batch sync-BN (the default
    under the mesh). Both store torch's UNBIASED batch variance in the
    running var (flax nn.BatchNorm stores the biased one — an eval-time
    n/(n-1) delta, material at small spatial sizes; retired for full-loop
    eval parity, tests/test_full_loop_parity.py)."""
    return GroupedBatchNorm(groups=max(groups, 1),
                            use_running_average=not train,
                            momentum=0.9, epsilon=1e-5, dtype=dtype,
                            name=name)


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC.

    Plain reduce_window max; the backward is XLA's select-and-scatter.
    A hand-written scatter-free backward (max_pool_3x3_s2_scatterfree
    below) is a recorded NEGATIVE: 1779 vs 2646 clips/s on the flagship
    DGL bs64 step — the 9 strided .at[].add scatters lower far worse on
    TPU than the select-and-scatter they replace."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


@jax.custom_vjp
def max_pool_3x3_s2_scatterfree(x: jnp.ndarray) -> jnp.ndarray:
    """max_pool_3x3_s2 with a custom backward: 9 offset-shifted
    compare/select passes plus strided scatter-adds instead of XLA
    select-and-scatter. Semantically IDENTICAL to the autodiff/torch rule
    (gradient to the FIRST maximal element of each window in row-major
    order, ties included — asserted in tests/test_ops.py). Kept as a
    tested reference implementation; measured SLOWER on TPU (see
    max_pool_3x3_s2's docstring), so not used by the models."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


def _max_pool_fwd(x):
    m = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    return m, x  # the max is recomputed in the backward (see below)


def _max_pool_bwd(res, g):
    x = res
    # CRITICAL: barrier x so every backward view reads ONE materialized
    # tensor. Without it XLA may duplicate x's elementwise producer chain
    # (conv+BN+relu) into multiple fusions with different FMA contractions;
    # the bitwise-different copies then fail the exact-equality max match
    # and gradients get silently DROPPED (reproduced: conv1 grads off by
    # O(10) under jit, exact eagerly). The max is also recomputed from the
    # same nine views rather than reusing the forward's reduce_window
    # output, for the same reason.
    x = jax.lax.optimization_barrier(x)
    b, h, w, c = x.shape
    ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                      else jnp.iinfo(x.dtype).min, x.dtype)
    # value view pad (-inf keeps out-of-bounds cells from matching the max)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    views = []
    for di in range(3):
        for dj in range(3):
            views.append(jax.lax.slice(
                xp, (0, di, dj, 0),
                (b, di + 2 * (ho - 1) + 1, dj + 2 * (wo - 1) + 1, c),
                (1, 2, 2, 1)))
    m = views[0]
    for xv in views[1:]:
        m = jnp.maximum(m, xv)
    gp = jnp.zeros((b, h + 2, w + 2, c), g.dtype)
    count = jnp.zeros(m.shape, jnp.int32)
    for (di, dj), xv in zip(((i, j) for i in range(3) for j in range(3)),
                            views):
        eq = xv == m
        take = jnp.logical_and(eq, count == 0)
        count = count + eq.astype(jnp.int32)
        gp = gp.at[:, di:di + 2 * ho:2, dj:dj + 2 * wo:2, :].add(
            jnp.where(take, g, jnp.zeros((), g.dtype)))
    return (gp[:, 1:h + 1, 1:w + 1, :],)


max_pool_3x3_s2_scatterfree.defvjp(_max_pool_fwd, _max_pool_bwd)


@jax.custom_vjp
def max_pool_3x3_s2_padbwd(x: jnp.ndarray) -> jnp.ndarray:
    """max_pool_3x3_s2 with a DILATION-pad backward: the nine per-offset
    gradient placements are lax.pad ops with interior padding (zeros
    interleaved to the stride-2 input grid) summed in one fusion —
    no scatter HLO anywhere. Same first-max tie semantics as XLA's
    select-and-scatter / torch (asserted in tests/test_ops.py). The
    earlier scatter-free attempt placed the same contributions with nine
    strided .at[].add updates, which lower to real scatters and LOSE 33%
    end-to-end (max_pool_3x3_s2 docstring); pads are fusible loop ops."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


def _max_pool_padbwd_bwd(res, g):
    x = res
    # same producer-duplication hazard as _max_pool_bwd: barrier x so the
    # nine backward views read ONE materialized tensor (see that comment)
    x = jax.lax.optimization_barrier(x)
    b, h, w, c = x.shape
    ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
                      else jnp.iinfo(x.dtype).min, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    views = []
    for di in range(3):
        for dj in range(3):
            views.append(jax.lax.slice(
                xp, (0, di, dj, 0),
                (b, di + 2 * (ho - 1) + 1, dj + 2 * (wo - 1) + 1, c),
                (1, 2, 2, 1)))
    m = views[0]
    for xv in views[1:]:
        m = jnp.maximum(m, xv)
    zero = jnp.zeros((), g.dtype)
    count = jnp.zeros(m.shape, jnp.int32)
    dxp = None
    for (di, dj), xv in zip(((i, j) for i in range(3) for j in range(3)),
                            views):
        eq = xv == m
        take = jnp.logical_and(eq, count == 0)
        count = count + eq.astype(jnp.int32)
        contrib = jnp.where(take, g, zero)  # [b, ho, wo, c]
        # element a lands at index di + 2a of the padded [h+2] axis —
        # exactly the gp[:, di:di+2*ho:2] placement, built as one
        # interior-padded (dilated) pad instead of a strided scatter
        term = jax.lax.pad(
            contrib, zero,
            ((0, 0, 0),
             (di, h + 2 - (2 * ho - 1) - di, 1),
             (dj, w + 2 - (2 * wo - 1) - dj, 1),
             (0, 0, 0)))
        dxp = term if dxp is None else dxp + term
    return (dxp[:, 1:h + 1, 1:w + 1, :],)


max_pool_3x3_s2_padbwd.defvjp(_max_pool_fwd, _max_pool_padbwd_bwd)


def global_avg_pool(x: jnp.ndarray, axes) -> jnp.ndarray:
    """adaptive_avg_pool to 1 over the given spatial axes, then squeeze."""
    return jnp.mean(x, axis=axes)


Initializer = Callable[..., jnp.ndarray]
