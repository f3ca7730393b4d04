"""Golden-value numerics for the on-device preprocessing ops.

The STFT replaces librosa.stft (dataset/CramedDataset.py:65-66 etc.);
librosa is not in this image, so torch.stft — the same textbook definition
(periodic Hann, center reflect padding) — is the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gdl_tpu.config import AUDIO_PARAMS, spectrogram_shape
from gdl_tpu.ops.stft import log_stft, np_resize_flat, prepare_waveform
from gdl_tpu.ops.image_ops import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    eval_preprocess,
    normalize_images,
    random_resized_crop_flip,
    resize_images,
)


def torch_log_stft(wave: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    t = torch.from_numpy(wave.astype(np.float32))
    win = torch.hann_window(n_fft, periodic=True)
    s = torch.stft(t, n_fft=n_fft, hop_length=hop, window=win, center=True,
                   pad_mode="reflect", return_complex=True)
    return torch.log(torch.abs(s) + 1e-7).numpy()


@pytest.mark.parametrize("dataset", ["CREMAD", "KineticSound", "AVE",
                                     "kinect400"])
def test_log_stft_matches_torch(dataset):
    p = AUDIO_PARAMS[dataset]
    n = p["sample_rate"] * p["seconds"]
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((2, n)).astype(np.float32) * 0.3

    ours = np.asarray(log_stft(jnp.asarray(wave), p["n_fft"], p["hop"]))
    ref = np.stack([torch_log_stft(w, p["n_fft"], p["hop"]) for w in wave])

    assert ours.shape == (2, p["n_fft"] // 2 + 1, 1 + n // p["hop"])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_cremad_spectrogram_shape():
    """[257, 188] — the exact shape main_dgl feeds the audio stem
    (SURVEY §2.2); KS [129, 626]; AVE np.resized to 224² (AVEDataset.py:88);
    swin variants 224² (CramedDataset.py:163)."""
    assert spectrogram_shape("CREMAD") == (257, 188)
    assert spectrogram_shape("KineticSound") == (129, 626)
    assert spectrogram_shape("AVE") == (224, 224)
    assert spectrogram_shape("CREMAD", swin=True) == (224, 224)


def test_prepare_waveform_tile_and_clip():
    """np.tile(samples, 3)[:target] + clamp (dataset/CramedDataset.py:61-64)."""
    wave = jnp.array([[0.5, -2.0, 3.0]])
    out = np.asarray(prepare_waveform(wave, target_len=7))
    np.testing.assert_allclose(out, [[0.5, -1.0, 1.0, 0.5, -1.0, 1.0, 0.5]])


def test_np_resize_flat_matches_numpy():
    x = np.arange(24, dtype=np.float32).reshape(1, 4, 6)
    ours = np.asarray(np_resize_flat(jnp.asarray(x), (5, 7)))
    ref = np.resize(x[0], (5, 7))
    np.testing.assert_array_equal(ours[0], ref)


def test_normalize_matches_torchvision_math():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img)))
    ref = (img.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / \
        np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_random_resized_crop_shapes_and_determinism():
    frames = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (2, 3, 48, 48, 3)),
        dtype=jnp.uint8)
    k = jax.random.PRNGKey(7)
    a = random_resized_crop_flip(frames, k, size=32)
    b = random_resized_crop_flip(frames, k, size=32)
    c = random_resized_crop_flip(frames, jax.random.PRNGKey(8), size=32)
    assert a.shape == (2, 3, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # normalized output should be roughly centered
    assert abs(float(jnp.mean(a))) < 3.0


def test_eval_preprocess_resize_then_normalize():
    img = jnp.full((1, 2, 16, 16, 3), 128, jnp.uint8)
    out = eval_preprocess(img, size=8)
    assert out.shape == (1, 2, 8, 8, 3)
    ref = (128.0 / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], ref, rtol=1e-5)


def test_resize_matches_torch_bilinear():
    rng = np.random.default_rng(3)
    img = rng.random((1, 17, 23, 3)).astype(np.float32)
    ours = np.asarray(resize_images(jnp.asarray(img), 224))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), size=(224, 224),
        mode="bilinear", align_corners=False, antialias=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("impl", ["scatterfree", "padbwd", "pallas"])
def test_max_pool_custom_bwd_matches_select_and_scatter(impl):
    """The custom maxpool backwards (9 compare passes placed either as
    strided scatter-adds or as interior-padded dilation pads) against
    XLA's select-and-scatter autodiff: identical placement on tie-heavy
    inputs, eager AND under jit composed after an elementwise producer
    chain — the jit case regressed once when XLA duplicated the producer
    into differently-FMA'd fusions and the exact-equality match dropped
    gradients (fixed with an optimization_barrier + in-backward max)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from gdl_tpu.models import layers as _layers
    from gdl_tpu.ops.maxpool import max_pool_3x3_s2_pallas

    max_pool_3x3_s2 = {
        "scatterfree": _layers.max_pool_3x3_s2_scatterfree,
        "padbwd": _layers.max_pool_3x3_s2_padbwd,
        "pallas": max_pool_3x3_s2_pallas,
    }[impl]

    def ref_pool(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    rng = np.random.RandomState(11)
    # integer-valued tie-heavy inputs: any placement error shows as O(1)
    for shape in ((1, 9, 7, 2), (2, 16, 12, 4)):
        x = jnp.asarray(
            rng.randint(0, 3, size=shape).astype(np.float32))
        g = jnp.asarray(rng.randint(1, 5, size=ref_pool(x).shape)
                        .astype(np.float32))
        ref = jax.vjp(ref_pool, x)[1](g)[0]
        got = jax.vjp(max_pool_3x3_s2, x)[1](g)[0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # jit-composed after a producer chain (the historical failure mode)
    w = jnp.asarray(rng.randn(16).astype(np.float32))
    x = jnp.asarray(rng.randn(4, 16, 12, 16).astype(np.float32))

    def chain(pool):
        def loss(w):
            y = nn.relu(x * w + jnp.tanh(w))
            return jnp.sum(jnp.sin(pool(y) * 3.0))
        return loss

    g1 = jax.jit(jax.grad(chain(max_pool_3x3_s2)))(w)
    g2 = jax.jit(jax.grad(chain(ref_pool)))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)
