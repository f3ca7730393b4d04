"""Multi-chip-without-a-cluster tests (SURVEY §4.3): the 8-virtual-device
CPU mesh stands in for a v5e-8. Checks the TPU-native replacement for
DataParallel (main.py:507): data-parallel sharded loss == single-device
loss, training steps produce identical params, and the tensor-parallel
'model' axis on the fusion head changes nothing numerically."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdl_tpu.config import Config
from gdl_tpu.data.synthetic import synthetic_batch
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.parallel.mesh import batch_sharding, make_mesh, state_sharding
from gdl_tpu.train.dgl import (
    create_train_state,
    dgl_loss_fn,
    make_dgl_train_step,
)
from gdl_tpu.train.optim import make_optimizer

TINY = dict(encoder_width=8, encoder_stages=[1, 1, 1, 1], fps=1,
            log_grad_csv=False)


def tiny_batch(n_classes=6, b=8, f=33, t=20, img=32):
    r = jax.random.PRNGKey(5)
    ra, rv, rl = jax.random.split(r, 3)
    return {
        "audio": jax.random.normal(ra, (b, f, t, 1)),
        "visual": jax.random.normal(rv, (b, 1, img, img, 3)),
        "label": jax.random.randint(rl, (b,), 0, n_classes),
    }


@functools.lru_cache(maxsize=None)
def build(mp=1):
    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=4.0,
                 dp=8 // mp, mp=mp, **TINY)
    model = AVClassifierDGL(config=cfg)
    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), optimizer,
                               frames=1, image_size=32)
    return cfg, model, optimizer, state


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("mp", [1, 2])
def test_sharded_loss_equals_single_device(mp):
    cfg, model, optimizer, state = build(mp)
    batch = tiny_batch()

    def loss_of(params, batch_stats, batch):
        loss, _ = dgl_loss_fn(model, params, batch_stats, batch, cfg,
                              train=False)
        return loss

    # single device, eager
    ref = float(loss_of(state.params, state.batch_stats, batch))

    # sharded: batch over 'data', params per the mesh rules
    mesh = make_mesh(cfg.dp, cfg.mp)
    st_sh = state_sharding(state, mesh)
    state_sharded = jax.device_put(state, st_sh)
    batch_sharded = {k: jax.device_put(v, batch_sharding(mesh))
                     for k, v in batch.items()}
    sharded = float(jax.jit(loss_of)(state_sharded.params,
                                     state_sharded.batch_stats,
                                     batch_sharded))
    np.testing.assert_allclose(sharded, ref, rtol=2e-5)


def test_train_step_dp_equals_tp_mesh():
    """One full train step under the (8,1) and (4,2) meshes yields the same
    updated params — layout must never change numerics."""
    batch = tiny_batch()
    results = {}
    for mp in (1, 2):
        cfg, model, optimizer, state = build(mp)
        mesh = make_mesh(cfg.dp, cfg.mp)
        state_l = jax.device_put(state, state_sharding(state, mesh))
        step = jax.jit(make_dgl_train_step(model, cfg, optimizer))
        batch_l = {k: jax.device_put(v, batch_sharding(mesh))
                   for k, v in batch.items()}
        new_state, metrics = step(state_l, batch_l)
        results[mp] = (jax.device_get(new_state.params),
                       float(metrics["loss"]))

    assert np.isclose(results[1][1], results[2][1], rtol=2e-5)
    for a, b in zip(jax.tree.leaves(results[1][0]),
                    jax.tree.leaves(results[2][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_fusion_kernel_actually_sharded_on_model_axis():
    cfg, model, optimizer, state = build(mp=2)
    mesh = make_mesh(cfg.dp, cfg.mp)
    st = jax.device_put(state, state_sharding(state, mesh))
    kernel = st.params["fusion_module"]["fc_out"]["kernel"]
    # input dim 128 split across model=2
    assert kernel.sharding.spec == jax.sharding.PartitionSpec("model", None)


def test_raw_batch_train_step_deterministic():
    """Seeded reproducibility (SURVEY §4.5): same seed → identical metrics;
    augmentation rng derives from (base seed, step)."""
    cfg, model, optimizer, state = build(1)
    from gdl_tpu.data.preprocess import make_train_preprocess

    step = jax.jit(make_dgl_train_step(
        model, cfg, optimizer, preprocess=make_train_preprocess(cfg, 32),
        base_rng=jax.random.PRNGKey(3)))
    raw = {k: jnp.asarray(v)
           for k, v in synthetic_batch(cfg, 8, raw_size=48).items()}
    _, m1 = step(state, raw)
    _, m2 = step(state, raw)
    assert float(m1["loss"]) == float(m2["loss"])


def _tree_allclose(a, b, rtol=5e-4, atol=1e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_mmformer_sharded_step_equals_single_device(dp, mp):
    """The intermediate family's trainer (train/auxi.py — mmformer's
    7-tuple AUXI+KL step) under the dp=8 mesh AND the hybrid (4, 2)
    dp x mp mesh (VERDICT r3 item 6 — the transformer ffn/fc2 kernels
    are row-parallel over 'model'): identical loss and
    updated params vs the unsharded jit of the same step. Extends the
    DGL-only sharding equality to the family main_intermediate.py
    drives (the dropout/PE rng draws and the BN batch stats are
    partitioned by SPMD, not re-derived per shard)."""
    from gdl_tpu.models.intermediate import MMFormerN
    from gdl_tpu.train.auxi import make_auxi_train_step
    from gdl_tpu.train.dgl import TrainState

    cfg = Config(dataset="CREMAD", batch_size=8, fps=1, alpha=2.0,
                 beta=1e-5, dp=dp, mp=mp, log_grad_csv=False)
    model = MMFormerN(num_classes=6, width=8, embed_dim=32, seq_len=4)
    opt = make_optimizer(cfg, 10)
    rng = jax.random.PRNGKey(0)
    # av_inputs=False: direct two-image-stream entry (the 224-resize
    # adapter path would defeat the tiny shapes this 1-core host needs)
    variables = model.init({"params": rng, "drop": rng, "dropout": rng,
                            "pe": rng},
                           jnp.zeros((2, 32, 32, 3)),
                           jnp.zeros((2, 32, 32, 3)),
                           train=False, av_inputs=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt.init(variables["params"]))
    r = jax.random.PRNGKey(5)
    ra, rv, rl = jax.random.split(r, 3)
    batch = {"audio": jax.random.normal(ra, (8, 32, 32, 3)),
             "visual": jax.random.normal(rv, (8, 32, 32, 3)),
             "label": jax.random.randint(rl, (8,), 0, 6)}
    step = jax.jit(make_auxi_train_step(
        model, cfg, opt, seven_tuple=True, base_rng=jax.random.PRNGKey(1),
        av_inputs=False))

    ref_state, ref_metrics = step(state, batch)

    mesh = make_mesh(cfg.dp, cfg.mp)
    st_sh = jax.device_put(state, state_sharding(state, mesh))
    b_sh = {k: jax.device_put(v, batch_sharding(mesh))
            for k, v in batch.items()}
    sh_state, sh_metrics = step(st_sh, b_sh)

    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-5)
    _tree_allclose(jax.device_get(ref_state.params),
                   jax.device_get(sh_state.params))


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_ogm_sharded_step_equals_single_device(dp, mp):
    """The OGM-GE MODULATED joint step (main.py:286-332 lineage) under the
    dp=8 and hybrid (4, 2) meshes: the modulation reads batch-GLOBAL
    softmax score sums (ogm_coefficients — SPMD must psum them, not
    compute per-shard ratios) and draws param-shaped GE noise from the
    step-derived rbg key (replicated generation), so one modulated step
    must yield identical params to the unsharded jit. The other sharded
    tests all run modulation='Normal'; this covers the live-modulation
    branch bench.py's ogm anchor times."""
    from gdl_tpu.models.classifier import AVClassifier
    from gdl_tpu.train.joint import make_joint_train_step

    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=0.3,
                 modulation="OGM_GE", modulation_starts=0,
                 modulation_ends=50, dp=dp, mp=mp, batch_size=8,
                 encoder_width=8, encoder_stages=[1, 1, 1, 1], fps=1,
                 log_grad_csv=False)
    model = AVClassifier(config=cfg)
    opt = make_optimizer(cfg, 10, clip_norm=None)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt,
                               frames=1, image_size=32)
    batch = tiny_batch(b=8)
    step = jax.jit(make_joint_train_step(model, cfg, opt, 10,
                                         base_rng=jax.random.PRNGKey(1)))

    ref_state, ref_metrics = step(state, batch)

    mesh = make_mesh(cfg.dp, cfg.mp)
    st_sh = jax.device_put(state, state_sharding(state, mesh))
    b_sh = {k: jax.device_put(v, batch_sharding(mesh))
            for k, v in batch.items()}
    sh_state, sh_metrics = step(st_sh, b_sh)

    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-5)
    _tree_allclose(jax.device_get(ref_state.params),
                   jax.device_get(sh_state.params))


@pytest.mark.parametrize("dp,mp", [(8, 1), (4, 2)])
def test_swin_sharded_step_equals_single_device(dp, mp):
    """The swin joint path under the dp=8 mesh AND the hybrid (4, 2)
    dp x mp mesh (mlp_fc2 kernels row-parallel over 'model'), tiny swin
    config: same loss + params as the unsharded jit — the window
    partition/reverse and relative-position gathers must be
    batch-shardable without numeric drift."""
    from gdl_tpu.models.classifier import AVClassifierSwin
    from gdl_tpu.train.joint import make_joint_train_step

    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=1.0,
                 backbone="swin", modulation="Normal", batch_size=8,
                 fps=1, dp=dp, mp=mp, log_grad_csv=False,
                 swin_embed_dim=16, swin_depths=[1, 1], swin_heads=[2, 4],
                 swin_window=4, swin_img_size=32, swin_patch=4)
    model = AVClassifierSwin(config=cfg)
    opt = make_optimizer(cfg, 10, clip_norm=None)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt,
                               spec_shape=(32, 32), frames=1)
    batch = tiny_batch(b=8, f=32, t=32, img=32)
    step = jax.jit(make_joint_train_step(model, cfg, opt, 10,
                                         base_rng=jax.random.PRNGKey(1)))

    ref_state, ref_metrics = step(state, batch)

    mesh = make_mesh(cfg.dp, cfg.mp)
    st_sh = jax.device_put(state, state_sharding(state, mesh))
    b_sh = {k: jax.device_put(v, batch_sharding(mesh))
            for k, v in batch.items()}
    sh_state, sh_metrics = step(st_sh, b_sh)

    np.testing.assert_allclose(float(sh_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-5)
    _tree_allclose(jax.device_get(ref_state.params),
                   jax.device_get(sh_state.params))
