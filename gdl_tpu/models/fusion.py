"""Late-fusion module family — the heart of DGL.

Capability parity with reference models/fusion_modules.py (250 LoC, 9+1
classes). Every module's `__call__(x, y)` returns the reference 3-tuple
`(x_out, y_out, fused_out)`.

DGL variants additionally expose two methods consumed by the DGL train step
(gdl_tpu/train/dgl.py):

  - `unimodal(x, y) -> (x_out, y_out)`: the AUXI logits, computed from LIVE
    features. The train step applies this method with stop-gradiented fusion
    parameters, reproducing the reference's erase-fusion-grads-after-unimodal-
    backward surgery (main_dgl.py:114-119) without any post-hoc grad editing.
  - `fuse(x, y) -> out`: the fused logits, with `jax.lax.stop_gradient`
    placed internally exactly where the reference calls `.detach()`
    (fusion_modules.py:27-29, :53-56, :159-166, :235-244), so the fused loss
    never reaches the encoders.

Net gradient topology per step (== reference main_dgl.py:108-122):
  encoders   ← alpha * (loss_a + loss_v) only
  fusion head← loss_f only
and in the Gated / separate-AUXI variants, fc_x/fc_y/fc_auxi receive NO
gradient at all (the reference erases their unimodal grads and its fused
path detaches after them — they stay frozen at init; see test
tests/test_dgl_gradients.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdl_tpu.models.layers import dense_xavier_init


def _dense(features: int, dtype, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        dtype=dtype,
        kernel_init=dense_xavier_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )


sg = jax.lax.stop_gradient


class SumFusion(nn.Module):
    """fc_x(x) + fc_y(y) (fusion_modules.py:5-13)."""

    input_dim: int = 512
    output_dim: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_x = _dense(self.output_dim, self.dtype, "fc_x")
        self.fc_y = _dense(self.output_dim, self.dtype, "fc_y")

    def __call__(self, x, y):
        return x, y, self.fc_x(x) + self.fc_y(y)


class SumFusionDGL(nn.Module):
    """fusion_modules.py:16-30."""

    input_dim: int = 512
    output_dim: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_x = _dense(self.output_dim, self.dtype, "fc_x")
        self.fc_y = _dense(self.output_dim, self.dtype, "fc_y")

    def unimodal(self, x, y):
        return self.fc_x(x), self.fc_y(y)

    def fuse(self, x, y):
        # reference detaches the features before the shared heads (:27-29)
        return self.fc_x(sg(x)) + self.fc_y(sg(y))

    def __call__(self, x, y):
        outx, outy = self.unimodal(x, y)
        return outx, outy, self.fuse(x, y)


class ConcatFusion(nn.Module):
    """fc_out(cat(x, y)) (fusion_modules.py:33-42)."""

    input_dim: int = 1024
    output_dim: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_out = _dense(self.output_dim, self.dtype, "fc_out")

    def __call__(self, x, y):
        return x, y, self.fc_out(jnp.concatenate([x, y], axis=-1))


class ConcatFusionDGL(nn.Module):
    """THE default DGL fusion (--fusion_method concat).

    Parameter-shared AUXI (fusion_modules.py:45-59): unimodal logits come
    from the SAME fc_out fed zero-padded single-modality features (:57-58);
    the fused logits come from detached concatenated features (:53-56).

    The reference also allocates an unused `fc_auxi` Dense (:49); we keep it
    in the parameter tree (touched with zero weight at trace time so Flax
    materializes it) for checkpoint-schema parity.
    """

    input_dim: int = 1024
    output_dim: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_out = _dense(self.output_dim, self.dtype, "fc_out")
        self.fc_auxi = _dense(self.output_dim, self.dtype, "fc_auxi")

    def unimodal(self, x, y):
        x_out = self.fc_out(jnp.concatenate([x, jnp.zeros_like(y)], axis=-1))
        y_out = self.fc_out(jnp.concatenate([jnp.zeros_like(x), y], axis=-1))
        return x_out, y_out

    def fuse(self, x, y):
        z = sg(jnp.concatenate([x, y], axis=-1))
        out = self.fc_out(z)
        # materialize the reference's dead fc_auxi params (:49) without
        # contributing to the output or to any gradient
        if self.is_initializing():
            _ = self.fc_auxi(z)
        return out

    def __call__(self, x, y):
        x_out, y_out = self.unimodal(x, y)
        return x_out, y_out, self.fuse(x, y)


class ConcatFusionDGLUnimodal(nn.Module):
    """Separate-AUXI ablation (fusion_modules.py:62-76): unimodal logits via
    a distinct fc_auxi head. Under the DGL step fc_auxi receives no gradient
    (its unimodal grads are erased, the fused path never touches it) — the
    encoders learn through a frozen random head, faithfully."""

    input_dim: int = 1024
    output_dim: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_out = _dense(self.output_dim, self.dtype, "fc_out")
        self.fc_auxi = _dense(self.output_dim, self.dtype, "fc_auxi")

    def unimodal(self, x, y):
        x_out = self.fc_auxi(jnp.concatenate([x, jnp.zeros_like(y)], axis=-1))
        y_out = self.fc_auxi(jnp.concatenate([jnp.zeros_like(x), y], axis=-1))
        return x_out, y_out

    def fuse(self, x, y):
        return self.fc_out(sg(jnp.concatenate([x, y], axis=-1)))

    def __call__(self, x, y):
        x_out, y_out = self.unimodal(x, y)
        return x_out, y_out, self.fuse(x, y)


class ConcatFusionSwin(nn.Module):
    """Concat head for Swin features (fusion_modules.py:79-88)."""

    input_dim: int = 768 * 2
    output_dim: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_out = _dense(self.output_dim, self.dtype, "fc_out")

    def __call__(self, x, y):
        return x, y, self.fc_out(jnp.concatenate([x, y], axis=-1))


class FiLM(nn.Module):
    """Named FiLM but actually a bilinear outer-product fusion
    (fusion_modules.py:91-124; the FiLM math proper is commented out there).
    Returns the unsqueezed features like the reference (:116-117)."""

    input_dim: int = 512
    dim: int = 768
    output_dim: int = 100
    x_film: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.fc = _dense(self.dim, self.dtype, "fc")
        self.fc_out = _dense(self.output_dim, self.dtype, "fc_out")

    def __call__(self, x, y):
        xe = x[:, :, None]  # [B, D, 1]
        ye = y[:, None, :]  # [B, 1, D]
        z = jnp.einsum("bdo,boe->bde", xe, ye).reshape(x.shape[0], -1)
        out = self.fc_out(self.fc(z))
        return xe, ye, out


class FiLMDGL(nn.Module):
    """fusion_modules.py:126-178. dim=512 (vs 768 in the baseline).

    fused: outer product of detached features through shared fc/fc_out
    (:159-166); unimodal: per-modality outer SELF-products through the same
    shared heads (:168-176)."""

    input_dim: int = 512
    dim: int = 512
    output_dim: int = 100
    x_film: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.fc = _dense(self.dim, self.dtype, "fc")
        self.fc_out = _dense(self.output_dim, self.dtype, "fc_out")

    def _head(self, z):
        return self.fc_out(self.fc(z.reshape(z.shape[0], -1)))

    def unimodal(self, x, y):
        z_x = jnp.einsum("bd,be->bde", x, x)  # bmm(x, x^T) (:168)
        z_y = jnp.einsum("bd,be->bde", y, y)  # bmm(y^T, y) (:173)
        return self._head(z_x), self._head(z_y)

    def fuse(self, x, y):
        z = jnp.einsum("bd,be->bde", sg(x), sg(y))  # detached bmm (:159-162)
        return self._head(z)

    def __call__(self, x, y):
        z_x, z_y = self.unimodal(x, y)
        return z_x, z_y, self.fuse(x, y)


class GatedFusion(nn.Module):
    """Sigmoid gate from one modality scales the other
    (fusion_modules.py:181-210)."""

    input_dim: int = 512
    dim: int = 512
    output_dim: int = 100
    x_gate: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_x = _dense(self.dim, self.dtype, "fc_x")
        self.fc_y = _dense(self.dim, self.dtype, "fc_y")
        self.fc_out = _dense(self.output_dim, self.dtype, "fc_out")

    def __call__(self, x, y):
        out_x = self.fc_x(x)
        out_y = self.fc_y(y)
        if self.x_gate:
            out = self.fc_out(jax.nn.sigmoid(out_x) * out_y)
        else:
            out = self.fc_out(out_x * jax.nn.sigmoid(out_y))
        return out_x, out_y, out


class GatedFusionDGL(nn.Module):
    """fusion_modules.py:213-250.

    The reference detaches AFTER fc_x/fc_y in the fused path (:235-244), so
    fc_x/fc_y receive gradients from neither stream — we stop-gradient the
    post-fc activations accordingly. Unimodal logits are self-gated through
    the shared fc_out (:246-249)."""

    input_dim: int = 512
    dim: int = 512
    output_dim: int = 100
    x_gate: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.fc_x = _dense(self.dim, self.dtype, "fc_x")
        self.fc_y = _dense(self.dim, self.dtype, "fc_y")
        self.fc_out = _dense(self.output_dim, self.dtype, "fc_out")

    def unimodal(self, x, y):
        out_x = self.fc_x(x)
        out_y = self.fc_y(y)
        x_out = self.fc_out(jax.nn.sigmoid(out_x) * out_x)
        y_out = self.fc_out(jax.nn.sigmoid(out_y) * out_y)
        return x_out, y_out

    def fuse(self, x, y):
        x_d = sg(self.fc_x(x))  # out_x.detach() (:235)
        y_d = sg(self.fc_y(y))  # out_y.detach() (:236)
        if self.x_gate:
            return self.fc_out(jax.nn.sigmoid(x_d) * y_d)
        return self.fc_out(x_d * jax.nn.sigmoid(y_d))

    def __call__(self, x, y):
        x_out, y_out = self.unimodal(x, y)
        return x_out, y_out, self.fuse(x, y)


DGL_FUSIONS = (SumFusionDGL, ConcatFusionDGL, ConcatFusionDGLUnimodal,
               FiLMDGL, GatedFusionDGL)


def make_fusion(method: str, n_classes: int, dgl: bool,
                input_dim: int = 512, dtype: Any = jnp.float32,
                shared_auxi: bool = True) -> nn.Module:
    """Fusion selection mirroring models/basic_model.py:28-40."""
    if method == "sum":
        cls = SumFusionDGL if dgl else SumFusion
        return cls(input_dim=input_dim, output_dim=n_classes, dtype=dtype)
    if method == "concat":
        if dgl:
            cls = ConcatFusionDGL if shared_auxi else ConcatFusionDGLUnimodal
        else:
            cls = ConcatFusion
        return cls(input_dim=2 * input_dim, output_dim=n_classes, dtype=dtype)
    if method == "film":
        cls = FiLMDGL if dgl else FiLM
        return cls(input_dim=input_dim, output_dim=n_classes, dtype=dtype)
    if method == "gated":
        cls = GatedFusionDGL if dgl else GatedFusion
        return cls(input_dim=input_dim, output_dim=n_classes, dtype=dtype)
    raise NotImplementedError("Incorrect fusion method: {}!".format(method))
