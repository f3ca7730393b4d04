"""Swin-backbone DGL: gradient topology holds and the full DGL train step
runs sharded over the 8-device mesh (BASELINE's VGGSound-Swin-DGL
configuration, tiny-sized)."""

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.config import Config
from gdl_tpu.models.classifier import AVClassifierSwinDGL
from gdl_tpu.parallel.mesh import batch_sharding, make_mesh, state_sharding
from gdl_tpu.train.dgl import (
    create_train_state,
    dgl_loss_fn,
    make_dgl_train_step,
    stop_fusion_gradients,
    cross_entropy,
)
from gdl_tpu.train.optim import make_optimizer

SWIN_TINY = dict(swin_embed_dim=16, swin_depths=[1, 1], swin_heads=[2, 4],
                 swin_window=4, swin_img_size=32, swin_patch=4,
                 backbone="swin", log_grad_csv=False)


def build():
    cfg = Config(dataset="VGGSound", fusion_method="concat", alpha=3.0,
                 **SWIN_TINY)
    model = AVClassifierSwinDGL(config=cfg)
    r = jax.random.PRNGKey(0)
    batch = {
        "audio": jax.random.normal(r, (8, 32, 32, 1)),
        "visual": jax.random.normal(r, (8, 2, 32, 32, 3)),
        "label": jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 309),
    }
    variables = model.init({"params": r}, batch["audio"], batch["visual"],
                           train=False)
    return cfg, model, variables, batch


def tree_max_abs(tree):
    leaves = [jnp.max(jnp.abs(x)) for x in jax.tree.leaves(tree)]
    return float(jnp.max(jnp.stack(leaves))) if leaves else 0.0


def test_swin_dgl_gradient_topology():
    cfg, model, variables, batch = build()
    bs = variables.get("batch_stats", {})

    def fused_only(params):
        vs = {"params": params, "batch_stats": bs}
        a, v = model.apply(vs, batch["audio"], batch["visual"], train=False,
                           method="encode")
        return cross_entropy(model.apply(vs, a, v, method="fused_logits"),
                             batch["label"])

    grads = jax.grad(fused_only)(variables["params"])
    enc = {k: v for k, v in grads.items() if "fusion" not in k}
    fus = {k: v for k, v in grads.items() if "fusion" in k}
    assert tree_max_abs(enc) == 0.0
    assert tree_max_abs(fus) > 0.0

    def unimodal_only(params):
        vs = {"params": params, "batch_stats": bs}
        a, v = model.apply(vs, batch["audio"], batch["visual"], train=False,
                           method="encode")
        stopped = {"params": stop_fusion_gradients(params),
                   "batch_stats": bs}
        oa, ov = model.apply(stopped, a, v, method="unimodal_logits")
        return cross_entropy(oa, batch["label"]) + cross_entropy(
            ov, batch["label"])

    grads = jax.grad(unimodal_only)(variables["params"])
    enc = {k: v for k, v in grads.items() if "fusion" not in k}
    fus = {k: v for k, v in grads.items() if "fusion" in k}
    assert tree_max_abs(fus) == 0.0
    assert tree_max_abs(enc) > 0.0


def test_swin_dgl_train_step_on_mesh():
    cfg, model, variables, batch = build()
    optimizer = make_optimizer(cfg, steps_per_epoch=5)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), optimizer,
                               spec_shape=(32, 32), frames=2, image_size=32)
    mesh = make_mesh(8, 1)
    state = jax.device_put(state, state_sharding(state, mesh))
    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in batch.items()}
    step = jax.jit(make_dgl_train_step(model, cfg, optimizer))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(new_state.step)) == 1
