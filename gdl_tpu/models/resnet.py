"""Dual-stem ResNet encoders, TPU-native (NHWC, Flax).

Capability parity with reference models/backbone.py: torchvision-style
ResNet-18/50 with a modality-specific stem — audio Conv(1→64, 7x7, s2),
visual Conv(3→64, 7x7, s2) (backbone.py:96-103) — returning the layer-4
feature map with no avgpool/fc (backbone.py:158-201). The visual forward
folds time into batch: [B, T, H, W, C] → [B*T, H, W, C]
(backbone.py:160-164; reference is NCHW, here channel-last for the TPU's
native conv layout).

Note the reference's `resnet50` is mislabeled — it is built from BasicBlock
(backbone.py:260-262); we reproduce that contract (a ResNet-34-shaped net)
under the same name.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdl_tpu.models.layers import batch_norm, conv, max_pool_3x3_s2


class StemConv7x7s2(nn.Module):
    """The 7x7/stride-2 stem conv (backbone.py:96-103), with an optional
    space-to-depth lowering for the TPU MXU.

    The plain form contracts over K = 7·7·Cin (49 for audio, 147 for
    visual) — shallow, im2col-heavy work that profiles at a fraction of
    peak. The s2d form is the SAME linear map re-expressed: pad the
    kernel to 8x8 (zeros), split input and kernel into 2x2 spatial parity
    planes, and run a dense stride-1 VALID 4x4 conv over the
    half-resolution, 4·Cin-channel packing (the MLPerf ResNet 'conv0
    space-to-depth' trick). Bitwise it differs only by float reassociation.

    The parameter is `kernel` [7,7,Cin,F] under this module's name, so a
    ResNet using it under name='conv1' keeps the exact conv1/kernel param
    path (checkpoints + torch interop unchanged).

    mode: 'auto' = s2d on TPU backends, plain conv elsewhere;
          's2d' / 'conv' force a path (tests).

    MEASURED (v5e, full CREMA-D DGL bs64 step): a wash — 2646 clips/s
    s2d vs 2664 plain. The stem's 22% step share is BN + maxpool on the
    large maps, not the conv, and the padded 8x8 kernel adds 31% nominal
    stem FLOPs (which would also inflate the XLA-cost-model MFU bench.py
    reports). ResNet therefore defaults stem_mode='conv'; the lowering
    stays available and tested."""

    features: int
    dtype: Any = jnp.float32
    mode: str = "auto"

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (7, 7, c, self.features))
        kernel = kernel.astype(self.dtype)
        use_s2d = (self.mode == "s2d"
                   or (self.mode == "auto"
                       and jax.default_backend() == "tpu"))
        if not use_s2d:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # out[i] = sum_{r<8} xpad[2i+r]·w8[r] with w8[7]=0 == the 7-tap
        # stride-2 conv; split by parity -> 4-tap stride-1 on each plane.
        ph, pw = 3 + h % 2, 3 + w % 2  # right pad: even length for s2d
        xp = jnp.pad(x, ((0, 0), (3, ph), (3, pw), (0, 0)))
        h2, w2 = (h + 3 + ph) // 2, (w + 3 + pw) // 2
        xs = xp.reshape(b, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, h2, w2, 4 * c)
        wk = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 8x8
        wk = wk.reshape(4, 2, 4, 2, c, self.features)
        wk = wk.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c,
                                                    self.features)
        return jax.lax.conv_general_dilated(
            xs, wk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    """Two 3x3 convs with identity/projection shortcut (backbone.py:31-68)."""

    filters: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.bn_groups
        residual = x
        y = conv(self.filters, 3, self.stride, self.dtype, name="conv1")(x)
        y = batch_norm(train, self.dtype, name="bn1", groups=g)(y)
        y = nn.relu(y)
        y = conv(self.filters, 3, 1, self.dtype, name="conv2")(y)
        y = batch_norm(train, self.dtype, name="bn2", groups=g)(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            residual = conv(self.filters, 1, self.stride, self.dtype,
                            name="downsample_conv")(x)
            residual = batch_norm(train, self.dtype,
                                  name="downsample_bn", groups=g)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature-map encoder: stem + 4 stages, returns [N, H/32, W/32, 512].

    modality='audio' expects [B, F, T, 1] log-spectrograms; 'visual' expects
    [B, T, H, W, 3] frame stacks and folds T into the batch dimension.
    """

    modality: str  # 'audio' | 'visual'
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64  # stem width; stages are (w, 2w, 4w, 8w)
    dtype: Any = jnp.float32
    bn_groups: int = 1  # >1: per-replica (DataParallel-semantics) BN
    stem_mode: str = "conv"  # 's2d'/'auto' select the space-to-depth
    # stem lowering — measured a wash on the full step (see StemConv7x7s2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.modality == "visual":
            if x.ndim != 5:
                raise ValueError(
                    "visual input must be [B, T, H, W, C], got %s"
                    % (x.shape,)
                )
            b, t, h, w, c = x.shape
            x = x.reshape(b * t, h, w, c)
        elif self.modality != "audio":
            raise NotImplementedError(
                "Incorrect modality, should be audio or visual but got "
                + str(self.modality)
            )

        x = x.astype(self.dtype)
        x = StemConv7x7s2(self.width, dtype=self.dtype,
                          mode=self.stem_mode, name="conv1")(x)
        x = batch_norm(train, self.dtype, name="bn1",
                       groups=self.bn_groups)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        w = self.width
        filters = (w, 2 * w, 4 * w, 8 * w)
        for stage, (n_blocks, f) in enumerate(zip(self.stage_sizes, filters)):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(
                    filters=f, stride=stride, dtype=self.dtype,
                    bn_groups=self.bn_groups,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
        return x


def resnet18(modality: str, dtype: Any = jnp.float32, width: int = 64,
             stage_sizes: Sequence[int] | None = None,
             bn_groups: int = 1) -> ResNet:
    """backbone.py:255-257."""
    return ResNet(modality=modality,
                  stage_sizes=tuple(stage_sizes or (2, 2, 2, 2)),
                  width=width, dtype=dtype, bn_groups=bn_groups)


def resnet50(modality: str, dtype: Any = jnp.float32, width: int = 64) -> ResNet:
    """backbone.py:260-262 — BasicBlock [3,4,6,3], faithfully mislabeled."""
    return ResNet(modality=modality, stage_sizes=(3, 4, 6, 3), width=width,
                  dtype=dtype)
