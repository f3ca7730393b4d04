"""strict_compat host-exact visual path (VERDICT r4 item 4): the
torchvision transform runs on host at ORIGINAL resolution — one bilinear
resample, the reference's exact pixels (dataset/CramedDataset.py:76-101) —
retiring PARITY known-delta #2 (the default device path resamples
original→256² canvas→224, one extra bilinear pass).

Oracles are built inline from the torchvision SPEC (get_params'
10-attempt loop, crop-then-resize, p=0.5 flip) with an independent PIL
pipeline, not by calling the shipping code."""

import math
import random

import numpy as np
import pytest
from PIL import Image

from gdl_tpu.config import Config
from gdl_tpu.data.datasets import (
    CremadDataset,
    _host_rrc_params,
    _load_frames_exact,
)

class _FixedRng:
    """Scripted uniform/randint/random draws for deterministic params."""

    def __init__(self, uniforms, randints=(), randoms=()):
        self.uniforms = list(uniforms)
        self.randints = list(randints)
        self.randoms = list(randoms)

    def uniform(self, lo, hi):
        u = self.uniforms.pop(0)
        return lo + u * (hi - lo)

    def randint(self, lo, hi):
        return min(lo + self.randints.pop(0), hi)

    def random(self):
        return self.randoms.pop(0)


def test_host_rrc_params_first_valid_attempt():
    """A first-attempt-valid draw returns that attempt's integer box and
    consumes exactly area+aspect+y+x draws."""
    # u_area=0.5 -> target_area = 0.54*H*W; u_aspect=0.5 -> aspect 1.0
    rng = _FixedRng(uniforms=[0.5, 0.5], randints=[3, 7])
    h, w = 200, 200
    y0, x0, ch, cw = _host_rrc_params(rng, h, w)
    target_area = (0.08 + 0.5 * 0.92) * h * w
    assert ch == cw == int(round(math.sqrt(target_area)))
    assert (y0, x0) == (3, 7)
    assert not rng.uniforms and not rng.randints  # nothing extra drawn


def test_host_rrc_params_fallback_center_crop():
    """All 10 attempts invalid (area ~1.0 with extreme aspect on a thin
    image) → torchvision's ratio-clamped center crop."""
    # 10 attempts, each maximal area + maximal aspect -> cw > w always
    rng = _FixedRng(uniforms=[1.0, 1.0] * 10)
    h, w = 100, 30  # in_ratio = 0.3 < 3/4 -> cw=w, ch=round(w/(3/4))
    y0, x0, ch, cw = _host_rrc_params(rng, h, w)
    assert (cw, ch) == (30, 40)
    assert (y0, x0) == ((100 - 40) // 2, 0)


def test_host_rrc_params_box_always_in_bounds():
    for seed in range(50):
        rng = random.Random(seed)
        h, w = rng.randint(30, 300), rng.randint(30, 300)
        y0, x0, ch, cw = _host_rrc_params(rng, h, w)
        assert 0 < ch <= h and 0 < cw <= w
        assert 0 <= y0 <= h - ch and 0 <= x0 <= w - cw


def _fixture_jpeg(path, h=97, w=53, seed=3):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    Image.fromarray(arr).save(path, quality=95)


def test_exact_eval_is_single_resample(tmp_path):
    """Eval strict path == PIL Resize((224,224)) of the ORIGINAL image
    bitwise; the default canvas path (decode 256² then resize) differs —
    the delta the strict mode retires."""
    p = str(tmp_path / "f.jpg")
    _fixture_jpeg(p)
    got = _load_frames_exact([p], random.Random(0), train=False)[0]
    with Image.open(p) as img:
        want = np.asarray(img.convert("RGB").resize((224, 224),
                                                     Image.BILINEAR))
    np.testing.assert_array_equal(got, want)

    # the double-resample output is measurably different pixels
    with Image.open(p) as img:
        canvas = np.asarray(img.convert("RGB").resize((256, 256),
                                                      Image.BILINEAR),
                            np.uint8)
    import jax.numpy as jnp

    from gdl_tpu.ops.image_ops import resize_images

    double = np.asarray(resize_images(jnp.asarray(canvas), 224))
    assert np.abs(double - want.astype(np.float32)).max() > 1.0


def test_exact_train_pixels_match_spec_oracle(tmp_path):
    """Train strict path == independent PIL crop→resize→flip oracle with
    the same rng stream (params re-derived from the spec in-test)."""
    p = str(tmp_path / "f.jpg")
    _fixture_jpeg(p, h=120, w=180, seed=9)
    got = _load_frames_exact([p], random.Random(42), train=True)[0]

    # oracle: replay the identical draw sequence per the torchvision spec
    rng = random.Random(42)
    with Image.open(p) as img:
        img = img.convert("RGB")
        h, w = img.height, img.width
        box = None
        for _ in range(10):
            ta = h * w * rng.uniform(0.08, 1.0)
            ar = math.exp(rng.uniform(math.log(3 / 4), math.log(4 / 3)))
            cw = int(round(math.sqrt(ta * ar)))
            ch = int(round(math.sqrt(ta / ar)))
            if 0 < cw <= w and 0 < ch <= h:
                box = (rng.randint(0, h - ch), rng.randint(0, w - cw),
                       ch, cw)
                break
        assert box is not None
        y0, x0, ch, cw = box
        want = img.crop((x0, y0, x0 + cw, y0 + ch)).resize(
            (224, 224), Image.BILINEAR)
        if rng.random() < 0.5:
            want = want.transpose(Image.FLIP_LEFT_RIGHT)
        np.testing.assert_array_equal(got, np.asarray(want, np.uint8))


def test_cremad_strict_dataset_and_preprocess(tmp_path):
    """Dataset-level wiring: strict_compat emits [T,224,224,3] uint8 and
    make_train_preprocess only normalizes (no second resample)."""
    from tests.test_datasets import make_cremad_tree

    names = [("clipA", "NEU"), ("clipB", "HAP")]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    cfg = Config(dataset="CREMAD", audio_path=audio, visual_path=visual,
                 fps=1, strict_compat=1, random_seed=0)
    ds = CremadDataset(cfg, mode="train", data_root=data_root)
    sample = ds[0]
    # dict sample with the explicit host_exact marker (the device
    # preprocess must dispatch on it, not on a 224² shape coincidence)
    assert isinstance(sample, dict) and sample["host_exact"]
    wave, frames = sample["wave"], sample["frames"]
    label, sizes = sample["label"], sample["frame_sizes"]
    assert frames.shape == (1, 224, 224, 3) and frames.dtype == np.uint8
    assert (sizes == 224).all()

    import jax
    import jax.numpy as jnp

    from gdl_tpu.data.preprocess import make_train_preprocess
    from gdl_tpu.ops.image_ops import IMAGENET_MEAN, IMAGENET_STD

    pre = make_train_preprocess(cfg)
    batch = {"wave": jnp.asarray(wave)[None],
             "frames": jnp.asarray(frames)[None],
             "label": jnp.asarray([label]),
             "frame_sizes": jnp.asarray(sizes)[None],
             "host_exact": jnp.asarray([1], jnp.uint8)}
    out = pre(batch, jax.random.PRNGKey(0))
    want = (frames.astype(np.float32) / 255.0 - IMAGENET_MEAN) \
        / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(out["visual"][0]), want,
                               atol=1e-6)


def test_collate_cached_defers_to_strict_path(tmp_path):
    """--strict_compat + --preprocessed_path: the Loader's batched cached
    fast path must return None (the cache stores 256² canvas pixels — it
    cannot reproduce the host-exact single-resample output), so batches
    fall through to the per-sample host-exact path. Regression test for
    the round-5 gate (collate_cached bypassed strict_compat)."""
    from tests.test_datasets import make_cremad_tree

    names = [("clipA", "NEU"), ("clipB", "HAP")]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    cfg = Config(dataset="CREMAD", audio_path=audio, visual_path=visual,
                 fps=1, strict_compat=1, random_seed=0,
                 preprocessed_path=str(tmp_path / "cache"))
    ds = CremadDataset(cfg, mode="train", data_root=data_root)
    assert ds.collate_cached([0, 1]) is None
    # and the per-sample path serves host-exact dict samples
    assert isinstance(ds[0], dict) and ds[0]["host_exact"]


def test_loader_batches_carry_host_exact_marker(tmp_path):
    """Dict samples from the strict path survive Loader collation: the
    batch carries 'host_exact' and 224² frames end-to-end."""
    from tests.test_datasets import make_cremad_tree

    from gdl_tpu.data.loader import Loader

    names = [("clipA", "NEU"), ("clipB", "HAP")]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    cfg = Config(dataset="CREMAD", audio_path=audio, visual_path=visual,
                 fps=1, strict_compat=1, random_seed=0)
    ds = CremadDataset(cfg, mode="train", data_root=data_root)
    loader = Loader(ds, 2, shuffle=False, drop_last=True, num_workers=1,
                    seed=0)
    batch = next(iter(loader))
    assert "host_exact" in batch
    assert batch["frames"].shape[-3:-1] == (224, 224)
    assert batch["frame_sizes"].shape[-1] == 2


def test_unmarked_224_batch_still_augments_under_strict(tmp_path):
    """A 224² train batch WITHOUT the host_exact marker (e.g. synthetic
    data) must still take the device RandomResizedCrop under
    strict_compat — the dispatch keys on the explicit marker, never on a
    shape coincidence (silently skipping augmentation)."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.data.preprocess import make_train_preprocess
    from gdl_tpu.ops.image_ops import IMAGENET_MEAN, IMAGENET_STD

    cfg = Config(dataset="CREMAD", fps=1, strict_compat=1, random_seed=0)
    pre = make_train_preprocess(cfg)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (1, 1, 224, 224, 3)).astype(np.uint8)
    batch = {"wave": jnp.zeros((1, 48000), jnp.float32),
             "frames": jnp.asarray(frames),
             "label": jnp.asarray([0])}
    out = pre(batch, jax.random.PRNGKey(0))
    assert out["visual"].shape[-3:-1] == (224, 224)
    passthrough = (frames[0].astype(np.float32) / 255.0
                   - IMAGENET_MEAN) / IMAGENET_STD
    assert not np.allclose(np.asarray(out["visual"][0]), passthrough,
                           atol=1e-3), "augmentation was silently skipped"
