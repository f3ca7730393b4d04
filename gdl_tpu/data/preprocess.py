"""Device-side batch preprocessing, fused into the jitted train/eval step.

Raw batches {'wave' f32[B,N], 'frames' u8[B,T,R,R,3], 'label' i32[B]} turn
into model inputs {'audio' [B,F,T,1], 'visual' [B,T,224,224,3], 'label'}
entirely on-device: STFT+log (ops/stft.py), RandomResizedCrop+flip+normalize
(ops/image_ops.py) at train, Resize+normalize at eval. XLA fuses the
elementwise tail into the encoder stems; the host→device transfer is raw
uint8 frames + f32 waveforms (≈4x less PCIe/ICI traffic than shipping
normalized f32 pixel stacks like the reference's pipeline would).
"""

from __future__ import annotations

import jax

from gdl_tpu.config import Config
from gdl_tpu.ops.image_ops import (
    eval_preprocess,
    normalize_images,
    random_resized_crop_flip,
)
from gdl_tpu.ops.stft import spectrogram_for_dataset


def make_train_preprocess(cfg: Config, image_size: int = 224):
    swin = cfg.backbone == "swin"
    dataset = cfg.dataset
    # strict_compat: frames arrive ALREADY cropped/flipped to 224² on host
    # at original resolution (datasets._load_frames_exact — the reference's
    # exact single-resample pixels); only ToTensor+Normalize runs on device
    host_exact = bool(getattr(cfg, "strict_compat", 0))

    def preprocess(batch, rng: jax.Array):
        audio = spectrogram_for_dataset(batch["wave"], dataset, swin=swin)
        # 'host_exact' is an explicit marker set by the datasets' strict
        # path (dict-key presence — static at trace time): only batches
        # that REALLY carry host-transformed pixels skip the device
        # augmentation. Synthetic/canvas batches (any size) still take
        # the device transform under strict_compat.
        if host_exact and "host_exact" in batch:
            assert batch["frames"].shape[-2] == image_size, \
                "host_exact batch is not image_size²"
            visual = normalize_images(batch["frames"])
        else:
            # 'frame_sizes' [B,T,2] (per-frame original H,W) makes the crop
            # geometry torchvision-exact in original coordinates; datasets
            # ship it, synthetic batches may not (canvas-coordinate draws)
            visual = random_resized_crop_flip(
                batch["frames"], rng, size=image_size,
                orig_sizes=batch.get("frame_sizes"))
        return {"audio": audio, "visual": visual, "label": batch["label"]}

    return preprocess


def make_eval_preprocess(cfg: Config, image_size: int = 224):
    swin = cfg.backbone == "swin"
    dataset = cfg.dataset
    host_exact = bool(getattr(cfg, "strict_compat", 0))

    def preprocess(batch):
        audio = spectrogram_for_dataset(batch["wave"], dataset, swin=swin)
        if host_exact and "host_exact" in batch:
            assert batch["frames"].shape[-2] == image_size, \
                "host_exact batch is not image_size²"
            visual = normalize_images(batch["frames"])
        else:
            visual = eval_preprocess(batch["frames"], size=image_size)
        return {"audio": audio, "visual": visual, "label": batch["label"]}

    return preprocess
