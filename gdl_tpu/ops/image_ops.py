"""On-device image preprocessing: fused normalize + augmentation.

Replaces the reference's per-sample host torchvision pipeline
(dataset/CramedDataset.py:76-101: RandomResizedCrop(224) +
RandomHorizontalFlip + ToTensor + ImageNet Normalize at train; Resize(224)
+ Normalize at test). Frames ship to the device as uint8 and everything
else — crop sampling, bilinear resample, flip, /255, normalize — runs
inside the jitted step as one fused XLA program (static shapes; the dynamic
crop geometry is expressed through `jax.image.scale_and_translate`, whose
scale/translation operands are traced values).

torchvision RandomResizedCrop defaults reproduced EXACTLY: area scale
U(0.08, 1.0), log-uniform aspect ratio in (3/4, 4/3), 10 attempts with
integer-rounded crop sizes rejected when they exceed the image, then the
ratio-clamped center-crop fallback — vectorized (all 10 candidates drawn at
once, first valid selected) so it stays one fused XLA program with static
shapes; flips are p=0.5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy on purpose: module-level jnp.array would initialize the JAX
# backend at import time, which breaks jax.distributed.initialize() for
# any driver importing this module first (multi-host bring-up). XLA
# constant-folds these under jit either way.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_images(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [..., H, W, 3] → float32 ToTensor+Normalize
    (dataset/CramedDataset.py:80-81)."""
    x = x.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def resize_images(x: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, 3] to size×size (test transform,
    dataset/CramedDataset.py:84-88); matches torch F.interpolate
    bilinear/antialias=False (tested). jax.image.resize's matmul
    formulation wins over gather-lerp on TPU (see random_resized_crop
    note)."""
    batch_dims = x.shape[:-3]
    out_shape = batch_dims + (size, size, 3)
    return jax.image.resize(x.astype(jnp.float32), out_shape,
                            method="bilinear")


RRC_ATTEMPTS = 10
_MIN_RATIO, _MAX_RATIO = 3.0 / 4.0, 4.0 / 3.0


def sample_rrc_box(key: jax.Array, h, w):
    """torchvision RandomResizedCrop.get_params, vectorized.

    Draws all 10 candidates at once: integer-rounded (ch, cw) from area
    U(0.08, 1)*H*W and log-uniform aspect; a candidate is valid iff
    0 < cw <= W and 0 < ch <= H; the FIRST valid one wins (argmax of the
    mask). If none is valid the torchvision fallback applies: clamp the
    image's aspect ratio into [3/4, 4/3] and center-crop. Returns float
    (y0, x0, ch, cw) with integer values.

    h/w may be python ints OR traced f32 scalars — the latter lets the
    draw happen in ORIGINAL image coordinates (the reference applies
    RandomResizedCrop to the original-size PIL image,
    dataset/CramedDataset.py:76-88) with per-sample sizes shipped in the
    batch; see random_resized_crop_flip."""
    h = jnp.asarray(h, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    k_area, k_ratio, k_xy = jax.random.split(key, 3)
    n = RRC_ATTEMPTS
    areas = jax.random.uniform(k_area, (n,), minval=0.08,
                               maxval=1.0) * (h * w)
    ratios = jnp.exp(jax.random.uniform(
        k_ratio, (n,), minval=jnp.log(_MIN_RATIO),
        maxval=jnp.log(_MAX_RATIO)))
    cws = jnp.round(jnp.sqrt(areas * ratios))
    chs = jnp.round(jnp.sqrt(areas / ratios))
    valid = (cws > 0) & (cws <= w) & (chs > 0) & (chs <= h)
    first = jnp.argmax(valid)  # first True (0 if none — fallback masks it)
    any_valid = jnp.any(valid)

    # fallback: ratio-clamped center crop (torchvision transforms.py)
    in_ratio = w / h
    fb_w = jnp.where(in_ratio < _MIN_RATIO, w,
                     jnp.where(in_ratio > _MAX_RATIO,
                               jnp.round(h * _MAX_RATIO), w))
    fb_h = jnp.where(in_ratio < _MIN_RATIO, jnp.round(w / _MIN_RATIO),
                     h)

    cw = jnp.where(any_valid, cws[first], fb_w)
    ch = jnp.where(any_valid, chs[first], fb_h)
    # torch.randint(0, H - h + 1) — uniform over the inclusive range
    u_y, u_x = jax.random.uniform(k_xy, (2,))
    y0_rand = jnp.floor(u_y * (h - ch + 1.0))
    x0_rand = jnp.floor(u_x * (w - cw + 1.0))
    y0 = jnp.where(any_valid, y0_rand, jnp.floor((h - ch) / 2.0))
    x0 = jnp.where(any_valid, x0_rand, jnp.floor((w - cw) / 2.0))
    return y0, x0, ch, cw


def _rrc_one(img: jnp.ndarray, key: jax.Array, size: int,
             orig_hw=None) -> jnp.ndarray:
    """RandomResizedCrop + HFlip for one [H, W, 3] float image.

    orig_hw ([2] int/float, traced) = the ORIGINAL image size before the
    host's canonical-canvas decode. When given, the crop box is drawn in
    original coordinates — torchvision's exact geometry distribution —
    and mapped onto the canvas; None keeps canvas-coordinate draws (the
    synthetic/bench paths, where no original exists)."""
    h, w = img.shape[0], img.shape[1]
    k_box, k_flip = jax.random.split(key)
    if orig_hw is None:
        y0, x0, ch, cw = sample_rrc_box(k_box, h, w)
    else:
        oh = jnp.maximum(jnp.asarray(orig_hw[0], jnp.float32), 1.0)
        ow = jnp.maximum(jnp.asarray(orig_hw[1], jnp.float32), 1.0)
        y0, x0, ch, cw = sample_rrc_box(k_box, oh, ow)
        # map the original-coordinate box onto the (squashed) canvas
        sy, sx = h / oh, w / ow
        y0, ch = y0 * sy, ch * sy
        x0, cw = x0 * sx, cw * sx

    # map crop box [y0, y0+ch) x [x0, x0+cw) → [0, size)²:
    # out(u) = in(u/scale - translate/scale) under scale_and_translate's
    # convention out = scale * in + translation. The dense resampling
    # matrices this builds are MXU work — measured FASTER on TPU than a
    # separable gather-lerp bilinear (1.1 vs 2.5 ms at bs64; TPU gathers
    # are expensive, unlike GPUs).
    scale = jnp.stack([size / ch, size / cw])
    translation = jnp.stack([-y0 * size / ch, -x0 * size / cw])
    out = jax.image.scale_and_translate(
        img, (size, size, 3), (0, 1), scale, translation, method="bilinear")

    flip = jax.random.bernoulli(k_flip)
    return jnp.where(flip, out[:, ::-1, :], out)


def random_resized_crop_flip(frames: jnp.ndarray, key: jax.Array,
                             size: int = 224,
                             orig_sizes=None) -> jnp.ndarray:
    """[B, T, H, W, 3] uint8/float frames → [B, T, size, size, 3] float32
    augmented + normalized. Each frame gets an independent crop/flip, like
    the reference's per-frame transform invocation
    (dataset/CramedDataset.py:95-101).

    orig_sizes ([B, T, 2] int: per-frame original H, W — the batch's
    'frame_sizes' key) makes the crop geometry exactly torchvision's:
    parameters drawn against the ORIGINAL size, then mapped onto the
    canonical canvas. None = canvas-coordinate draws (synthetic data)."""
    b, t = frames.shape[0], frames.shape[1]
    x = frames.astype(jnp.float32)
    keys = jax.random.split(key, b * t).reshape(b, t, 2)
    if orig_sizes is None:
        out = jax.vmap(jax.vmap(lambda im, k: _rrc_one(im, k, size)))(
            x, keys)
    else:
        out = jax.vmap(jax.vmap(
            lambda im, k, s: _rrc_one(im, k, size, orig_hw=s)))(
                x, keys, jnp.asarray(orig_sizes))
    return (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def eval_preprocess(frames: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Test-time transform: Resize(size, size) + Normalize."""
    x = resize_images(frames, size)
    return (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
