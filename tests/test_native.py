"""Native C++ host pipeline vs the pure-Python/scipy reference path."""

import wave as wave_mod

import numpy as np
import pytest

from gdl_tpu.data import native
from gdl_tpu.data.wav import load_wav as py_load_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


def write_wav(path, samples, rate, channels=1):
    with wave_mod.open(str(path), "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((np.clip(samples, -1, 1) * 32767).astype(
            "<i2").tobytes())


def test_native_wav_read_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(12345) * 0.3).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, samples, 16000)
    n, rate = native.wav_info(str(p))
    assert (n, rate) == (12345, 16000)
    ours = native.load_wav(str(p), 16000)
    ref = py_load_wav(str(p), 16000)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_native_stereo_mono_mix(tmp_path):
    rng = np.random.default_rng(1)
    stereo = (rng.standard_normal((1000, 2)) * 0.3).astype(np.float32)
    p = tmp_path / "s.wav"
    write_wav(p, stereo.reshape(-1), 8000, channels=2)
    ours = native.load_wav(str(p), 8000)
    ref = py_load_wav(str(p), 8000)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_native_resample_matches_scipy(tmp_path):
    rng = np.random.default_rng(2)
    samples = (rng.standard_normal(44100) * 0.3).astype(np.float32)
    p = tmp_path / "r.wav"
    write_wav(p, samples, 44100)
    ours = native.load_wav(str(p), 22050)
    ref = py_load_wav(str(p), 22050)  # scipy resample_poly path
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_native_fused_fixed_pipeline(tmp_path):
    """Fused decode+resample+tile+crop+clip == the host Python pipeline
    (dataset/CramedDataset.py:60-64 semantics)."""
    rng = np.random.default_rng(3)
    samples = (rng.standard_normal(30000) * 0.5).astype(np.float32)
    p = tmp_path / "f.wav"
    write_wav(p, samples, 44100)

    target = 22050 * 3
    ours = native.wav_to_fixed(str(p), 22050, target, tile=3, start=0)
    ref_wave = py_load_wav(str(p), 22050)
    ref = np.tile(ref_wave, 3)[:target]
    ref = np.clip(ref, -1, 1)
    if len(ref) < target:
        ref = np.pad(ref, (0, target - len(ref)))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_native_fused_random_start_crop(tmp_path):
    rng = np.random.default_rng(4)
    samples = (rng.standard_normal(16000 * 2) * 0.4).astype(np.float32)
    p = tmp_path / "k.wav"
    write_wav(p, samples, 16000)
    # KS semantics: tile to >= 10 s, 5 s crop from `start`
    start, target = 12345, 16000 * 5
    ours = native.wav_to_fixed(str(p), 16000, target, tile=8, start=start)
    ref_wave = py_load_wav(str(p), 16000)
    tiled = np.tile(ref_wave, 8)
    ref = np.clip(tiled[start:start + target], -1, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_native_jpeg_decode_close_to_pil(tmp_path, monkeypatch):
    monkeypatch.setenv("GDL_NATIVE_JPEG", "1")
    from PIL import Image

    rng = np.random.default_rng(5)
    # smooth image (JPEG-friendly) so decoder differences stay small
    base = rng.standard_normal((8, 8, 3))
    img = np.kron(base, np.ones((40, 40, 1)))  # 320x320 blocks
    img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=95)

    ours = native.decode_jpeg(str(p), 256)
    if ours is None:
        pytest.skip("libjpeg unavailable")
    assert ours.shape == (256, 256, 3) and ours.dtype == np.uint8

    with Image.open(p) as im:
        ref = np.asarray(im.convert("RGB").resize((256, 256),
                                                  Image.BILINEAR), np.uint8)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.mean() < 4.0, diff.mean()  # filter-level difference only
