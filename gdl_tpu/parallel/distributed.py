"""Multi-host bring-up (SURVEY §2.9/§5.8).

The reference is single-process DataParallel; its multi-node story is
"none". Here the SAME jit program scales to multiple hosts/slices: call
`maybe_initialize()` before any jax use and the data-parallel mesh simply
grows — XLA routes the gradient all-reduce over ICI within a slice and DCN
across slices, no code changes anywhere else.
"""

from __future__ import annotations

import os


def maybe_initialize() -> bool:
    """jax.distributed.initialize() when a coordinator is configured via the
    standard env (JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES,
    JAX_PROCESS_ID]) or a TPU pod runtime. Returns True if initialized."""
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=addr, **kwargs)
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
