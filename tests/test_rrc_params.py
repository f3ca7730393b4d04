"""RandomResizedCrop parameter sampling == torchvision's get_params
(VERDICT round-1 item 9 / weak #8: the single clamped draw is replaced by
the exact 10-attempt rejection loop + center fallback).

Oracle: torchvision.transforms.RandomResizedCrop.get_params re-implemented
literally in numpy (torchvision is not in this image); both samplers run
many draws and their support and distribution must agree.
"""

import numpy as np
import pytest

SIZE_CASES = [(256, 256), (240, 320), (100, 500)]


def _torchvision_get_params(rng, h, w, attempts=10):
    """Literal re-implementation of torchvision RandomResizedCrop
    .get_params (scale=(0.08, 1.0), ratio=(3/4, 4/3))."""
    area = h * w
    lo, hi = np.log(3 / 4), np.log(4 / 3)
    for _ in range(attempts):
        target_area = rng.uniform(0.08, 1.0) * area
        aspect = np.exp(rng.uniform(lo, hi))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            y0 = rng.integers(0, h - ch + 1)
            x0 = rng.integers(0, w - cw + 1)
            return y0, x0, ch, cw
    in_ratio = w / h
    if in_ratio < 3 / 4:
        cw = w
        ch = int(round(cw / (3 / 4)))
    elif in_ratio > 4 / 3:
        ch = h
        cw = int(round(ch * (4 / 3)))
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


def _our_boxes(h, w, n):
    import jax

    from gdl_tpu.ops.image_ops import sample_rrc_box

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    fn = jax.jit(jax.vmap(lambda k: sample_rrc_box(k, h, w)))
    y0, x0, ch, cw = map(np.asarray, fn(keys))
    return y0, x0, ch, cw


@pytest.mark.parametrize("h,w", SIZE_CASES)
def test_boxes_always_inside_image_and_integer(h, w):
    y0, x0, ch, cw = _our_boxes(h, w, 500)
    for arr in (y0, x0, ch, cw):
        np.testing.assert_array_equal(arr, np.round(arr))  # integer-valued
    assert (ch >= 1).all() and (cw >= 1).all()
    assert (ch <= h).all() and (cw <= w).all()
    assert (y0 >= 0).all() and (x0 >= 0).all()
    assert (y0 + ch <= h).all() and (x0 + cw <= w).all()


def test_distribution_matches_torchvision_oracle():
    """Same algorithm, different RNG streams: the area-fraction and aspect
    marginals must agree closely over many draws (256x256)."""
    h = w = 256
    n = 2000
    y0, x0, ch, cw = _our_boxes(h, w, n)
    ours_area = (ch * cw) / (h * w)
    ours_ratio = cw / ch

    rng = np.random.default_rng(0)
    ref = np.array([_torchvision_get_params(rng, h, w) for _ in range(n)],
                   np.float64)
    ref_area = (ref[:, 2] * ref[:, 3]) / (h * w)
    ref_ratio = ref[:, 3] / ref[:, 2]

    assert abs(ours_area.mean() - ref_area.mean()) < 0.02
    assert abs(ours_area.std() - ref_area.std()) < 0.02
    assert abs(np.log(ours_ratio).mean() - np.log(ref_ratio).mean()) < 0.02
    assert abs(np.log(ours_ratio).std() - np.log(ref_ratio).std()) < 0.02


def test_extreme_aspect_hits_center_fallback():
    """A 100x500 strip rejects most draws; when all 10 fail, the fallback
    must be the ratio-clamped CENTER crop — identical to the oracle's."""
    h, w = 100, 500
    y0, x0, ch, cw = _our_boxes(h, w, 3000)
    # fallback boxes for this geometry: in_ratio=5 > 4/3 -> ch=100, cw=133,
    # centered at y0=0, x0=183
    fb = (ch == 100) & (cw == 133) & (y0 == 0) & (x0 == 183)
    assert fb.any(), "center fallback never triggered at extreme aspect"

    rng = np.random.default_rng(1)
    ref = np.array([_torchvision_get_params(rng, h, w) for _ in range(3000)])
    ref_fb = ((ref[:, 2] == 100) & (ref[:, 3] == 133)
              & (ref[:, 0] == 0) & (ref[:, 1] == 183))
    # fallback frequency in the same ballpark (same rejection probability)
    ours_rate, ref_rate = fb.mean(), ref_fb.mean()
    assert abs(ours_rate - ref_rate) < 0.05, (ours_rate, ref_rate)


def _our_boxes_traced(h, w, n):
    """Boxes drawn with TRACED (h, w) operands — the original-coordinate
    path (batch 'frame_sizes'); same keys as _our_boxes so the h=w=canvas
    case must reproduce the static draws bitwise."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.ops.image_ops import sample_rrc_box

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    hs = jnp.full((n,), h, jnp.float32)
    ws = jnp.full((n,), w, jnp.float32)
    fn = jax.jit(jax.vmap(sample_rrc_box))
    y0, x0, ch, cw = map(np.asarray, fn(keys, hs, ws))
    return y0, x0, ch, cw


def test_traced_size_draws_match_static_bitwise():
    """orig_hw == canvas must leave the pre-round-4 stream untouched:
    identical keys + identical math → bit-identical boxes."""
    for h, w in SIZE_CASES:
        a = _our_boxes(h, w, 300)
        b = _our_boxes_traced(h, w, 300)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("h,w", [(360, 480), (720, 1280)])
def test_original_coordinate_draws_match_oracle(h, w):
    """VERDICT r3 item 3: the crop parameters are drawn against the
    ORIGINAL image size (dataset/CramedDataset.py:76-88 applies
    RandomResizedCrop to the undecoded PIL image), not the 256 canvas.
    The traced-size sampler at a real original size must satisfy the
    integer/bounds contract and match the torchvision oracle's area and
    aspect marginals at that size."""
    n = 2000
    y0, x0, ch, cw = _our_boxes_traced(h, w, n)
    for arr in (y0, x0, ch, cw):
        np.testing.assert_array_equal(arr, np.round(arr))
    assert (ch >= 1).all() and (cw >= 1).all()
    assert (y0 >= 0).all() and (x0 >= 0).all()
    assert (y0 + ch <= h).all() and (x0 + cw <= w).all()

    rng = np.random.default_rng(0)
    ref = np.array([_torchvision_get_params(rng, h, w) for _ in range(n)],
                   np.float64)
    ours_area = (ch * cw) / (h * w)
    ref_area = (ref[:, 2] * ref[:, 3]) / (h * w)
    ours_ratio, ref_ratio = cw / ch, ref[:, 3] / ref[:, 2]
    assert abs(ours_area.mean() - ref_area.mean()) < 0.02
    assert abs(ours_area.std() - ref_area.std()) < 0.02
    assert abs(np.log(ours_ratio).mean() - np.log(ref_ratio).mean()) < 0.02
    assert abs(np.log(ours_ratio).std() - np.log(ref_ratio).std()) < 0.02


def test_per_frame_sizes_change_geometry():
    """random_resized_crop_flip(orig_sizes=...) must actually use the
    per-frame sizes: the same frames/key with a non-square original size
    produce different pixels than canvas-coordinate draws, while
    canvas-equal sizes reproduce them exactly."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.ops.image_ops import random_resized_crop_flip

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (2, 2, 64, 64, 3), np.uint8)
    key = jax.random.PRNGKey(3)
    base = random_resized_crop_flip(frames, key, size=32)
    same = random_resized_crop_flip(
        frames, key, size=32,
        orig_sizes=np.full((2, 2, 2), 64, np.int32))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    other = random_resized_crop_flip(
        frames, key, size=32,
        orig_sizes=np.tile(np.array([360, 480], np.int32), (2, 2, 1)))
    assert not np.array_equal(np.asarray(base), np.asarray(other))
