"""On-device audio frontend: fused framing → window → rFFT → log-magnitude.

Replaces the reference's per-sample host librosa pipeline
(dataset/CramedDataset.py:60-66 and siblings), which dominates its step time
(SURVEY §3.5). Here the raw waveform batch ships to the device once and the
entire spectrogram computation runs inside the jitted train step, where XLA
fuses the windowing/log elementwise work around its native FFT.

Numerics match librosa.stft(y, n_fft, hop_length) with its defaults:
periodic Hann window, center=True reflect padding, magnitude, then
log(|S| + 1e-7). Golden-tested against torch.stft (same definition) in
tests/test_stft.py.

pad_mode note (ADVICE round 1): librosa >= 0.10 (2023) changed the stft
pad_mode default from 'reflect' to 'constant'. The reference environment is
Python 3.8.6 / PyTorch 1.11 / CUDA 11.1 (README.md:7-10, a 2022 stack), i.e.
librosa <= 0.9.x, whose default is 'reflect' — matched here (also
torch.stft's default, our golden oracle). Only the first/last ~n_fft/(2*hop)
frames differ between the modes.

Exact per-dataset parameters live in gdl_tpu.config.AUDIO_PARAMS.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _hann(n_fft: int) -> np.ndarray:
    """Periodic Hann — librosa's default window ('hann', fftbins=True)."""
    n = np.arange(n_fft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(np.float32)


def log_stft(wave: jnp.ndarray, n_fft: int, hop: int,
             eps: float = 1e-7) -> jnp.ndarray:
    """[B, N] float waveform → [B, n_fft//2+1, 1 + N//hop] log-magnitude.

    Output layout is [bins, frames] matching the reference spectrogram fed
    as [B, 1, F, T] (main_dgl.py:100; ours is consumed channel-last as
    [B, F, T, 1])."""
    if wave.ndim != 2:
        raise ValueError("wave must be [B, N], got %s" % (wave.shape,))
    b, n = wave.shape
    pad = n_fft // 2
    frames = 1 + n // hop

    x = jnp.pad(wave.astype(jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    # frame gather: [frames, n_fft] index matrix; XLA lowers this to an
    # efficient strided gather (static shapes throughout)
    idx = (jnp.arange(frames) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    segs = x[:, idx]  # [B, frames, n_fft]
    segs = segs * jnp.asarray(_hann(n_fft))
    spec = jnp.fft.rfft(segs, axis=-1)  # [B, frames, bins]
    mag = jnp.abs(spec)
    out = jnp.log(mag + eps)
    return jnp.transpose(out, (0, 2, 1))  # [B, bins, frames]


def prepare_waveform(wave: jnp.ndarray, target_len: int,
                     tile: int = 3) -> jnp.ndarray:
    """Tile-and-crop + clip to ±1 (dataset/CramedDataset.py:61-64:
    np.tile(samples, 3)[:sr*seconds] then clamp). Static-shape device op;
    `wave` must already be length >= target_len/tile or padded."""
    x = jnp.tile(wave, (1, tile))[:, :target_len]
    return jnp.clip(x, -1.0, 1.0)


def spectrogram_for_dataset(wave: jnp.ndarray, dataset: str,
                            swin: bool = False) -> jnp.ndarray:
    """Full audio frontend for a dataset batch: [B, N] raw (already
    resampled) waveform → [B, F, T, 1] NHWC log-spectrogram ready for the
    audio encoder stem. Swin runs "resize" to 224x224 — the reference uses
    np.resize (dataset/CramedDataset.py:163), which is a FLAT wrap-around
    repeat/truncate, not an image resize; reproduced faithfully. AVE does
    the same unconditionally (dataset/AVEDataset.py:88)."""
    from gdl_tpu.config import AUDIO_PARAMS

    p = AUDIO_PARAMS[dataset]
    spec = log_stft(wave, p["n_fft"], p["hop"])
    if swin or dataset == "AVE":
        spec = np_resize_flat(spec, (224, 224))
    return spec[..., None]


def np_resize_flat(x: jnp.ndarray, shape) -> jnp.ndarray:
    """Batched np.resize semantics: flatten each sample, tile until the
    target element count is reached, truncate, reshape."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    target = int(np.prod(shape))
    reps = -(-target // flat.shape[1])
    flat = jnp.tile(flat, (1, reps))[:, :target]
    return flat.reshape((b,) + tuple(shape))
