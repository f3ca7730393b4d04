"""gdl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for Disentangled
Gradient Learning (DGL, ICCV 2025) and its surrounding multimodal training
stack.

Re-designed from scratch with the capabilities of the reference PyTorch
codebase (shicaiwei123/ICCV2025-GDL): two-stream audio-visual classifiers
(ResNet-18 / Swin-B encoders), late- and intermediate-fusion modules,
DGL / OGM-GE optimization topologies, on-device STFT + image preprocessing,
and data-parallel training over a `jax.sharding.Mesh`.

The DGL trick — in the reference, a detach inside the fusion module
(fusion_modules.py:53-58) plus a two-phase backward with named-parameter
gradient erasure (main_dgl.py:108-122) — is expressed here as two
`jax.lax.stop_gradient` placements inside one pure loss function, so a
single `jax.value_and_grad` yields both disentangled gradient streams.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GDL_PLATFORM"):
    # authoritative backend selection: some site environments pin
    # JAX_PLATFORMS via sitecustomize, which silently overrides the env
    # var; jax.config wins as long as it runs before backend init
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GDL_PLATFORM"])

from gdl_tpu.config import Config, N_CLASSES  # noqa: F401
