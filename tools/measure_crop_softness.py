#!/usr/bin/env python
"""Quantify PARITY known-delta #2: the default visual path resamples
original→256² canvas→224 (two bilinear passes) where the reference goes
original→224 in one (dataset/CramedDataset.py:91-101). Crop GEOMETRY is
identical (drawn in original coordinates since round 4); this measures the
residual pixel softness of the extra resample, per original size.

For each synthetic JPEG and each of N crop boxes drawn by the shipping
sampler, compares:
  reference path: PIL crop(original) → PIL resize 224      (uint8)
  default path:   PIL original → 256² canvas → device
                  scale_and_translate crop → 224           (float)
and reports max-abs (0-255 scale) and PSNR. The strict_compat host-exact
path reproduces the reference pixels bitwise (tests/test_exact_crops.py),
so this number applies to the DEFAULT path only.

Usage: python tools/measure_crop_softness.py [--boxes 64]
"""

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", type=int, default=64)
    args = ap.parse_args()

    os.environ.setdefault("GDL_PLATFORM", "cpu")
    import gdl_tpu  # noqa: F401  (platform pin before backend init)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gdl_tpu.data.datasets import _host_rrc_params

    def device_crop(canvas_u8, y0, x0, ch, cw, oh, ow):
        """The shipping _rrc_one geometry: original-coordinate box mapped
        onto the 256² canvas, scale_and_translate to 224."""
        h, w = canvas_u8.shape[0], canvas_u8.shape[1]
        sy, sx = h / oh, w / ow
        y0, ch = y0 * sy, ch * sy
        x0, cw = x0 * sx, cw * sx
        scale = jnp.asarray([224 / ch, 224 / cw])
        trans = jnp.asarray([-y0 * 224 / ch, -x0 * 224 / cw])
        return np.asarray(jax.image.scale_and_translate(
            jnp.asarray(canvas_u8, jnp.float32), (224, 224, 3), (0, 1),
            scale, trans, method="bilinear"))

    rng = random.Random(0)
    print(f"{'orig':>9} {'boxes':>5} {'max|Δ|':>7} {'mean|Δ|':>8} "
          f"{'PSNR dB':>8}")
    for oh, ow in [(240, 320), (480, 640), (720, 1280), (200, 200)]:
        arr = np.random.default_rng(oh).integers(
            0, 256, (oh, ow, 3), dtype=np.uint8)
        # natural-image-ish content: smooth field + texture (pure noise
        # overstates resample loss; pure smooth understates it)
        yy, xx = np.mgrid[0:oh, 0:ow]
        smooth = (127 + 100 * np.sin(yy / 17.0) * np.cos(xx / 23.0))
        arr = np.clip(0.7 * smooth[..., None] + 0.3 * arr, 0,
                      255).astype(np.uint8)
        img = Image.fromarray(arr)
        canvas = np.asarray(img.resize((256, 256), Image.BILINEAR),
                            np.uint8)
        maxd, meand, mses = 0.0, [], []
        for _ in range(args.boxes):
            y0, x0, ch, cw = _host_rrc_params(rng, oh, ow)
            ref = np.asarray(
                img.crop((x0, y0, x0 + cw, y0 + ch)).resize(
                    (224, 224), Image.BILINEAR), np.float32)
            got = device_crop(canvas, y0, x0, ch, cw, oh, ow)
            d = np.abs(got - ref)
            maxd = max(maxd, float(d.max()))
            meand.append(float(d.mean()))
            mses.append(float(np.mean((got - ref) ** 2)))
        psnr = 10 * np.log10(255.0 ** 2 / max(np.mean(mses), 1e-9))
        print(f"{oh}x{ow:<5} {args.boxes:>5} {maxd:7.1f} "
              f"{np.mean(meand):8.2f} {psnr:8.2f}")


if __name__ == "__main__":
    main()
