"""Collective-structure checks for the multi-chip step (VERDICT round-2
item 7): beyond "sharded == single-device" numerics, assert the COMPILED
program moves data the way the sharding design intends —

  - the dp=8 DGL train step all-reduces gradients (XLA's combiner may
    group many tensors into few all-reduce ops — we bound the count, not
    demand one per tensor) and sync-BN's cross-replica statistics;
  - NO parameter all-gather exists in steady state: params are replicated
    by layout, so a param all-gather would mean GSPMD re-materializes them
    every step (the classic DP perf bug this layout avoids);
  - under the (4, 2) dp x mp mesh the fusion head's sharded matmul reduces
    over the 'model' axis instead of gathering the kernel.

Replaces what the reference's single-process DataParallel (main.py:507)
never had to prove. Runs on the 8-virtual-device CPU mesh (conftest).
"""

import re

import jax
import numpy as np

from tests.test_sharding import build, tiny_batch

from gdl_tpu.parallel.mesh import batch_sharding, make_mesh, state_sharding
from gdl_tpu.train.dgl import make_dgl_train_step


def _compiled_hlo(mp):
    cfg, model, optimizer, state = build(mp)
    mesh = make_mesh(cfg.dp, cfg.mp)
    state_sh = jax.device_put(state, state_sharding(state, mesh))
    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in tiny_batch().items()}
    step = jax.jit(make_dgl_train_step(model, cfg, optimizer))
    return step.lower(state_sh, batch).compile().as_text(), state


def _count_ops(hlo, name):
    return len(re.findall(rf"\b{name}(?:-start)?\.?\d*\s*=", hlo))


def test_dp8_step_allreduces_but_never_allgathers_params():
    hlo, state = _compiled_hlo(mp=1)

    n_allreduce = _count_ops(hlo, "all-reduce")
    n_allgather = _count_ops(hlo, "all-gather")
    n_grad_tensors = len(jax.tree.leaves(state.params))

    # gradients + sync-BN stats must cross replicas
    assert n_allreduce >= 1, "dp=8 step compiled without any all-reduce"
    # the combiner may merge tensors but never needs MORE all-reduce ops
    # than (grad tensors + BN stat pairs); a blowup here means GSPMD
    # stopped grouping and the step would be latency-bound on ICI
    assert n_allreduce <= 2 * n_grad_tensors, (
        f"{n_allreduce} all-reduces for {n_grad_tensors} grad tensors")
    # replicated params must stay resident: any all-gather in the steady
    # state means parameters are being re-materialized every step
    assert n_allgather == 0, f"found {n_allgather} all-gathers in dp-8 HLO"


def test_dp4_mp2_step_collective_structure():
    hlo, state = _compiled_hlo(mp=2)

    n_allreduce = _count_ops(hlo, "all-reduce")
    n_allgather = _count_ops(hlo, "all-gather")
    assert n_allreduce >= 1
    # the fusion-head TP matmul must contract via reduction collectives
    # (all-reduce / reduce-scatter), not by gathering the sharded kernel.
    # Activation-side all-gathers are acceptable (small [B, dim] tensors);
    # kernel-sized gathers are not.
    kernel_bytes = 4 * 128 * 6  # fc_out kernel [2*64, 6] fp32
    for m in re.finditer(r"all-gather[^=]*=\s*\S*f32\[([\d,]*)\]", hlo):
        dims = [int(d) for d in m.group(1).split(",") if d]
        size = 4 * int(np.prod(dims)) if dims else 4
        assert size < kernel_bytes, (
            f"param-sized all-gather in dp4xmp2 HLO: f32{dims}")


def test_dp8_gradients_identical_across_replicas():
    """After one compiled dp-8 step the (replicated-layout) params must be
    bitwise identical on every device — the all-reduce really synchronized
    the update (DataParallel's gather contract, SURVEY §2.9)."""
    cfg, model, optimizer, state = build(1)
    mesh = make_mesh(cfg.dp, cfg.mp)
    state_sh = jax.device_put(state, state_sharding(state, mesh))
    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in tiny_batch().items()}
    step = jax.jit(make_dgl_train_step(model, cfg, optimizer))
    new_state, _ = step(state_sh, batch)

    leaf = new_state.params["fusion_module"]["fc_out"]["kernel"]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 8
    for s in shards[1:]:
        np.testing.assert_array_equal(s, shards[0])


def test_mmformer_dp4_mp2_hlo_structure():
    """Hybrid-mesh HLO for the transformer family (VERDICT r3 item 6):
    with ffn/fc2 row-parallel over 'model', the compiled (4, 2) mmformer
    step must contract via reduction collectives — NO all-gather at the
    size of a sharded ffn kernel (that would mean GSPMD re-materializes
    the sharded weights every step instead of partial-sum matmuls)."""
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.models.intermediate import MMFormerN
    from gdl_tpu.train.auxi import make_auxi_train_step
    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", batch_size=8, fps=1, alpha=2.0,
                 beta=1e-5, dp=4, mp=2, log_grad_csv=False)
    model = MMFormerN(num_classes=6, width=8, embed_dim=32, seq_len=4)
    opt = make_optimizer(cfg, 10)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "drop": rng, "dropout": rng,
                            "pe": rng},
                           jnp.zeros((2, 32, 32, 3)),
                           jnp.zeros((2, 32, 32, 3)),
                           train=False, av_inputs=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt.init(variables["params"]))
    mesh = make_mesh(cfg.dp, cfg.mp)
    # the rule actually fired: ffn fc2 kernels carry a 'model' spec
    sh = state_sharding(state, mesh)
    fc2 = sh.params["intra0"]["cross0"]["ffn"]["fc2"]["kernel"]
    assert fc2.spec == jax.sharding.PartitionSpec("model", None)

    state_sh = jax.device_put(state, sh)
    r = jax.random.PRNGKey(5)
    ra, rv, rl = jax.random.split(r, 3)
    batch = {"audio": jax.random.normal(ra, (8, 32, 32, 3)),
             "visual": jax.random.normal(rv, (8, 32, 32, 3)),
             "label": jax.random.randint(rl, (8,), 0, 6)}
    b_sh = {k: jax.device_put(v, batch_sharding(mesh))
            for k, v in batch.items()}
    step = jax.jit(make_auxi_train_step(
        model, cfg, opt, seven_tuple=True, base_rng=jax.random.PRNGKey(1),
        av_inputs=False))
    hlo = step.lower(state_sh, b_sh).compile().as_text()

    assert _count_ops(hlo, "all-reduce") >= 1
    # fc2 is the smallest sharded kernel: [mlp_dim=4096, 32] f32; any
    # all-gather that big is a sharded param being re-materialized
    kernel_bytes = 4 * 4096 * 32 // 2  # per-shard size
    for m in re.finditer(r"all-gather[^=]*=\s*\S*f32\[([\d,]*)\]", hlo):
        dims = [int(d) for d in m.group(1).split(",") if d]
        size = 4 * int(np.prod(dims)) if dims else 4
        assert size < kernel_bytes, (
            f"param-sized all-gather in mmformer (4,2) HLO: f32{dims}")
