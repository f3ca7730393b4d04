"""Persistent XLA compilation cache for the drivers.

TPU compiles of the full train-step programs are expensive (minutes per
config through a remote-compile path); the jax persistent cache reuses
serialized executables across processes. Measured on the CREMA-D bs64
bench config: second-process startup 110 s vs 150 s cold (the remaining
cost is backend bring-up and per-program load). The reference has no
equivalent concern (torch eager).

Enabled by default by every driver (main.py / main_dgl.py /
main_intermediate.py / valid.py / bench.py) at
`~/.cache/gdl_tpu/xla`; `--compilation_cache_dir ''` disables,
`--compilation_cache_dir <path>` relocates.
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "gdl_tpu",
                           "xla")


def enable(path: Optional[str] = None) -> Optional[str]:
    """Configure the persistent compilation cache. Must run before the
    first compilation (import-time backend init is fine). Returns the
    cache dir, or None if disabled (path='')."""
    if path == "":
        return None
    path = path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program — on this hardware even small compiles pay a
    # per-program round trip worth skipping
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
