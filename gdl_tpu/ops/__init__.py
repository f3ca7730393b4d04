from gdl_tpu.ops.stft import log_stft, prepare_waveform  # noqa: F401
from gdl_tpu.ops.image_ops import (  # noqa: F401
    normalize_images,
    random_resized_crop_flip,
    resize_images,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
