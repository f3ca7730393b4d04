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


def batch_norm(train: bool, dtype: Any = jnp.float32,
               name: str | None = None) -> nn.BatchNorm:
    """BatchNorm matching torch defaults: eps 1e-5, running-stat momentum 0.1
    (Flax momentum = 1 - 0.1 = 0.9), scale init 1, bias init 0."""
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
