"""Device-mesh parallelism — the TPU-native replacement for DataParallel.

The reference scales with single-process `torch.nn.DataParallel`
(main.py:507, main_dgl.py:244): replicate the module, scatter the batch over
CUDA peers, gather. Here the same (and more) is one jit-compiled SPMD
program over a `jax.sharding.Mesh`:

  - 'data' axis: the batch is sharded over ICI; XLA inserts the gradient
    all-reduce (psum) automatically — the collective DP's gather emulates.
  - 'model' axis (new capability): large dense kernels (fusion head,
    classifier, FiLM's dim²→dim projection) are sharded over their input
    dimension; XLA turns the matmuls into partial-sum + reduce-scatter
    collectives. The reference has no TP (SURVEY §2.9) — models are small —
    but the axis demonstrates and future-proofs >1-D meshes.

BatchNorm note: under one jit program the batch statistics are computed over
the GLOBAL batch (XLA emits the cross-replica mean) — i.e. sync-BN, the
default (cfg.sync_bn; SURVEY §7 hard part 3): per-chip batches on a v5e-8 at
global batch 64 are 8 samples, where per-replica BN is noisy. `--sync_bn 0`
selects GroupedBatchNorm (gdl_tpu/models/layers.py): per-data-shard
statistics with replica-0 running-stat updates — DataParallel's exact
semantics, and collective-free because the groups align with the contiguous
batch shards.

Multi-host: the identical program runs under `jax.distributed.initialize`;
nothing here changes (DCN between slices, ICI within).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """('data', 'model') mesh. dp=-1 uses all devices / mp."""
    devices = devices if devices is not None else jax.devices()
    if dp == -1:
        dp = len(devices) // mp
    n = dp * mp
    mesh_devices = mesh_utils.create_device_mesh((dp, mp),
                                                 devices=devices[:n])
    return Mesh(mesh_devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension over 'data'."""
    return NamedSharding(mesh, P("data"))


def _param_spec(path, leaf, mp: int) -> P:
    """Sharding rule per parameter.

    Dense kernels under the fusion/classifier heads, plus the transformer
    MLPs' second (wide-input) projection — ffn/fc2 in the live transformer
    lib, mlp_fc2 in swin — are row-parallel over 'model' when their input
    dim divides it: each shard contracts its slice of the wide hidden dim
    and XLA all-reduces the partial products (Megatron row-parallel; no
    activation is ever model-sharded, so dropout masks stay identical to
    the dp-only program). Everything else (conv kernels, BN, biases,
    attention qkv — a Pallas custom-call operand that must stay
    replicated) keeps P() — the right layout at this model scale (encoder
    activations dominate memory, not params)."""
    names = [getattr(p, "key", "") for p in path]
    row_parallel = (
        any(("fusion" in n) or ("classifier" in n) for n in names)
        or "mlp_fc2" in names
        or ("fc2" in names and "ffn" in names)
    )
    if mp > 1 and leaf.ndim == 2 and leaf.shape[0] % mp == 0 and \
            row_parallel:
        return P("model", None)
    return P()


def state_sharding(state, mesh: Mesh):
    """NamedSharding pytree for a TrainState.

    Params follow `_param_spec`; step/batch_stats/opt_state are replicated
    (momentum traces get re-laid-out by GSPMD propagation after the first
    donated update — "computation follows data")."""
    mp = mesh.shape["model"]

    param_sh = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf, mp)),
        state.params)

    def replicate(tree):
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)

    return type(state)(
        step=NamedSharding(mesh, P()),
        params=param_sh,
        batch_stats=replicate(state.batch_stats),
        opt_state=replicate(state.opt_state),
    )


def shard_train_step(train_step, mesh: Mesh):
    """jit the step; shardings are carried by the arrays themselves
    (device_put the state with `state_sharding` and each batch with
    `batch_sharding` before calling). Donation keeps params/opt-state
    buffers in place across steps."""
    del mesh  # layout travels with the args
    return jax.jit(train_step, donate_argnums=(0,))


def put_sharded(tree, sharding):
    return jax.device_put(tree, sharding)
