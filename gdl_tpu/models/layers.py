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
            y = (x.astype(jnp.float32) - ra_mean.value) * jax.lax.rsqrt(
                ra_var.value + self.epsilon)
        else:
            g = self.groups
            b = x.shape[0]
            if b % g != 0:
                raise ValueError(
                    f"batch {b} not divisible into {g} BN groups (per-"
                    f"replica BN needs batch_size % dp == 0)")
            xg = x.astype(jnp.float32).reshape((g, b // g) + x.shape[1:])
            red = tuple(range(1, xg.ndim - 1))  # all but group & channel
            mean_g = jnp.mean(xg, axis=red)  # [g, C]
            var_g = jnp.var(xg, axis=red)    # biased (normalization)
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
    under the mesh)."""
    if groups > 1:
        return GroupedBatchNorm(groups=groups, use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, dtype=dtype,
                                name=name)
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) on NHWC."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


def global_avg_pool(x: jnp.ndarray, axes) -> jnp.ndarray:
    """adaptive_avg_pool to 1 over the given spatial axes, then squeeze."""
    return jnp.mean(x, axis=axes)


Initializer = Callable[..., jnp.ndarray]
