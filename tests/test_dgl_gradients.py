"""Gradient-topology unit tests — the defining property of DGL.

Asserts, for every DGL fusion variant, the exact disentanglement the
reference constructs operationally via detach + two-phase backward + grad
erasure (fusion_modules.py:53-58, main_dgl.py:108-122):

  1. the fused loss produces ZERO gradient on encoder params;
  2. the unimodal losses produce ZERO gradient on fusion params;
  3. the combined DGL loss therefore gives encoders exactly the
     alpha-scaled unimodal stream and the fusion head exactly the fused
     stream (streams do not mix);
  4. in GatedFusion_DGL, fc_x/fc_y receive no gradient at all (reference
     detaches after them in the fused path and erases the unimodal grads);
  5. in ConcatFusion_DGL_unimodal, fc_auxi receives no gradient at all.

Uses a width-8 single-block-per-stage encoder (same topology as ResNet-18,
cheap enough for this 1-core CI host) — the gradient-flow property is
architecture-size-independent.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdl_tpu.config import Config
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.train.dgl import cross_entropy, dgl_loss_fn, stop_fusion_gradients

TINY = dict(encoder_width=8, encoder_stages=[1, 1, 1, 1], fps=2)


def tiny_batch(seed=1, n_classes=6, b=4, f=33, t=20, frames=2, img=32):
    ra, rv, rl = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "audio": jax.random.normal(ra, (b, f, t, 1)),
        "visual": jax.random.normal(rv, (b, frames, img, img, 3)),
        "label": jax.random.randint(rl, (b,), 0, n_classes),
    }


@functools.lru_cache(maxsize=None)
def setup(method, alpha=4.0):
    cfg = Config(dataset="CREMAD", fusion_method=method, alpha=alpha, **TINY)
    model = AVClassifierDGL(config=cfg)
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch["audio"],
                           batch["visual"], train=False)
    return cfg, model, variables, batch


def tree_max_abs(tree):
    leaves = [jnp.max(jnp.abs(x)) for x in jax.tree.leaves(tree)]
    return float(jnp.max(jnp.stack(leaves))) if leaves else 0.0


def split_grads(grads):
    enc = {k: v for k, v in grads.items() if "fusion" not in k}
    fus = {k: v for k, v in grads.items() if "fusion" in k}
    return enc, fus


def fused_only_loss(model, variables, batch, params):
    vs = {"params": params, "batch_stats": variables["batch_stats"]}
    a, v = model.apply(vs, batch["audio"], batch["visual"], train=False,
                       method="encode")
    out = model.apply(vs, a, v, method="fused_logits")
    return cross_entropy(out, batch["label"])


def unimodal_only_loss(model, variables, batch, params):
    vs = {"params": params, "batch_stats": variables["batch_stats"]}
    a, v = model.apply(vs, batch["audio"], batch["visual"], train=False,
                       method="encode")
    stopped = {"params": stop_fusion_gradients(params),
               "batch_stats": variables["batch_stats"]}
    out_a, out_v = model.apply(stopped, a, v, method="unimodal_logits")
    return (cross_entropy(out_a, batch["label"])
            + cross_entropy(out_v, batch["label"]))


@functools.lru_cache(maxsize=None)
def grads_for(method, kind, alpha=4.0):
    cfg, model, variables, batch = setup(method, alpha)
    if kind == "fused":
        fn = functools.partial(fused_only_loss, model, variables, batch)
    elif kind == "unimodal":
        fn = functools.partial(unimodal_only_loss, model, variables, batch)
    else:
        def fn(params):
            loss, _ = dgl_loss_fn(model, params, variables["batch_stats"],
                                  batch, cfg, train=False)
            return loss
    return jax.grad(fn)(variables["params"])


METHODS = ["concat", "sum", "gated", "film"]


@pytest.mark.parametrize("method", METHODS)
def test_fused_loss_never_reaches_encoders(method):
    enc, fus = split_grads(grads_for(method, "fused"))
    assert tree_max_abs(enc) == 0.0, (
        f"{method}: fused loss leaked gradient into encoders")
    assert tree_max_abs(fus) > 0.0, (
        f"{method}: fused loss must train the fusion head")


@pytest.mark.parametrize("method", METHODS)
def test_unimodal_loss_never_reaches_fusion(method):
    enc, fus = split_grads(grads_for(method, "unimodal"))
    assert tree_max_abs(fus) == 0.0, (
        f"{method}: unimodal loss leaked gradient into the fusion head")
    assert tree_max_abs(enc) > 0.0, (
        f"{method}: unimodal loss must train the encoders")


@pytest.mark.parametrize("method", METHODS)
def test_combined_streams_do_not_mix(method):
    """combined-grad == alpha*unimodal-grad on encoders, fused-grad on the
    fusion head, exactly."""
    cfg, model, variables, batch = setup(method)
    enc_c, fus_c = split_grads(grads_for(method, "combined"))
    enc_u, _ = split_grads(grads_for(method, "unimodal"))
    _, fus_f = split_grads(grads_for(method, "fused"))

    for gc, gu in zip(jax.tree.leaves(enc_c), jax.tree.leaves(enc_u)):
        np.testing.assert_allclose(np.asarray(gc),
                                   cfg.alpha * np.asarray(gu),
                                   rtol=1e-5, atol=1e-7)
    for gc, gf in zip(jax.tree.leaves(fus_c), jax.tree.leaves(fus_f)):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gf),
                                   rtol=1e-5, atol=1e-7)


def test_gated_fc_x_fc_y_frozen():
    """GatedFusion_DGL: fc_x/fc_y get zero total gradient (reference
    detaches post-fc in the fused path, erases unimodal grads)."""
    fusion_grads = grads_for("gated", "combined")["fusion_module"]
    assert tree_max_abs(fusion_grads["fc_x"]) == 0.0
    assert tree_max_abs(fusion_grads["fc_y"]) == 0.0
    assert tree_max_abs(fusion_grads["fc_out"]) > 0.0


def test_separate_auxi_head_frozen():
    """ConcatFusion_DGL_unimodal: fc_auxi receives no gradient — the
    encoders learn through a frozen random head (see fusion.py docstring)."""
    from gdl_tpu.models.fusion import ConcatFusionDGLUnimodal
    fusion = ConcatFusionDGLUnimodal(input_dim=64, output_dim=6)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    y = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    labels = jnp.array([0, 1, 2, 3])
    variables = fusion.init(jax.random.PRNGKey(0), x, y)

    def loss(params, x, y):
        stopped = jax.tree.map(jax.lax.stop_gradient, params)
        out_a, out_v = fusion.apply({"params": stopped}, x, y,
                                    method="unimodal")
        out = fusion.apply({"params": params}, x, y, method="fuse")
        return (4.0 * (cross_entropy(out_a, labels)
                       + cross_entropy(out_v, labels))
                + cross_entropy(out, labels))

    grads = jax.grad(loss)(variables["params"], x, y)
    assert tree_max_abs(grads["fc_auxi"]) == 0.0
    assert tree_max_abs(grads["fc_out"]) > 0.0

    # but the encoders (here: the inputs) DO receive unimodal gradient
    # through the frozen fc_auxi
    gx = jax.grad(lambda xx: loss(variables["params"], xx, y))(x)
    assert float(jnp.max(jnp.abs(gx))) > 0.0


def test_shared_head_unimodal_uses_fc_out_weights():
    """ConcatFusion_DGL shared-AUXI: unimodal logits use the SAME fc_out
    weights (fusion_modules.py:57-58) and gradient flows through them into
    the features while fc_out itself only learns from the fused loss."""
    from gdl_tpu.models.fusion import ConcatFusionDGL
    fusion = ConcatFusionDGL(input_dim=64, output_dim=6)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    y = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    labels = jnp.array([0, 1, 2, 3])
    variables = fusion.init(jax.random.PRNGKey(0), x, y)
    params = variables["params"]

    out_a, out_v = fusion.apply({"params": params}, x, y, method="unimodal")
    w = params["fc_out"]["kernel"]
    b = params["fc_out"]["bias"]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(x @ w[:32] + b),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(y @ w[32:] + b),
                               rtol=2e-5, atol=1e-5)

    gx = jax.grad(
        lambda xx: cross_entropy(
            fusion.apply(
                {"params": jax.tree.map(jax.lax.stop_gradient, params)},
                xx, y, method="unimodal")[0],
            labels)
    )(x)
    assert float(jnp.max(jnp.abs(gx))) > 0.0


def test_dead_fc_auxi_materialized_for_ckpt_parity():
    """ConcatFusion_DGL allocates an unused fc_auxi (fusion_modules.py:49);
    our param tree keeps it so checkpoints have the same logical schema."""
    _, _, variables, _ = setup("concat")
    assert "fc_auxi" in variables["params"]["fusion_module"]
