"""SE-ResNet-18 building blocks for the intermediate-fusion family.

Capability parity with reference models/resnet18_se.py: ResNet-18 with a
3x3/stride-2 stem (resnet18_se.py:143), an SELayer after layer2 (:10-25,
:217), and a (layer3, layer4, avgpool, fc, dropout) trunk whose layer3
input width is configurable — the reference hardcodes `self.inplanes=256`
(:159) so the trunk only functions after a 2-stream concat; fed standalone
or after a 3-stream concat it shape-crashes (latent defect, SURVEY §2.6).
Here `SETrunk.in_width` makes every consumer well-formed.

The ImageNet partial-load path (:228-248) is a torchvision download — not
reproduced (zero-egress); random init per `weight_init` parity instead.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from gdl_tpu.models.layers import batch_norm, conv, dense_xavier_init, max_pool_3x3_s2
from gdl_tpu.models.resnet import BasicBlock


class SELayer(nn.Module):
    """Squeeze-and-excitation channel gate (resnet18_se.py:10-25)."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        y = nn.Dense(self.channels // self.reduction, dtype=self.dtype,
                     kernel_init=dense_xavier_init, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype,
                     kernel_init=dense_xavier_init, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEStem(nn.Module):
    """conv3x3/s2 + bn + relu + maxpool + layer1(64x2) + layer2(128x2)
    (+ optional SELayer, + optional 2x2 avg pool) — the per-modality
    'special bone' (sefusion.py:28-42, surf_mmfomer.py:258-276)."""

    use_se: bool = True
    use_avg: bool = False  # SURF_Fomer_N appends resnet's avg (2x2 pool)
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = x.astype(self.dtype)
        x = conv(w, 3, 2, self.dtype, name="conv1")(x)
        x = batch_norm(train, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        for i in range(2):
            x = BasicBlock(filters=w, stride=1, dtype=self.dtype,
                           name=f"layer1_{i}")(x, train)
        for i in range(2):
            x = BasicBlock(filters=2 * w, stride=2 if i == 0 else 1,
                           dtype=self.dtype, name=f"layer2_{i}")(x, train)
        if self.use_se:
            x = SELayer(2 * w, dtype=self.dtype, name="se")(x)
        if self.use_avg:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class SETrunk(nn.Module):
    """layer3(256x2) + layer4(512x2) + global avgpool + fc — the shared
    bone (sefusion.py:44-50). `in_width` is the concat width feeding
    layer3; num_classes sizes the fc. The reference allocates Dropout(0.5)
    but never applies it in the live forwards (sefusion.py:62 commented) —
    omitted."""

    num_classes: int
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_maps: bool = False):
        w = self.width
        for i in range(2):
            x = BasicBlock(filters=4 * w, stride=2 if i == 0 else 1,
                           dtype=self.dtype, name=f"layer3_{i}")(x, train)
        layer3 = x
        for i in range(2):
            x = BasicBlock(filters=8 * w, stride=2 if i == 0 else 1,
                           dtype=self.dtype, name=f"layer4_{i}")(x, train)
        layer4 = x
        pooled = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          kernel_init=dense_xavier_init,
                          bias_init=nn.initializers.zeros, name="fc")(pooled)
        if return_maps:
            return logits, layer3, layer4
        return logits
