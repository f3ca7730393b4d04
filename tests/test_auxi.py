"""AUXI multi-task step over the intermediate-fusion nets."""

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.config import Config
from gdl_tpu.models.intermediate import MMFormerN, MMTMNet
from gdl_tpu.train.auxi import make_auxi_train_step
from gdl_tpu.train.dgl import TrainState
from gdl_tpu.train.optim import make_optimizer


def make_state(model, batch, optimizer, **kw):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "drop": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "pe": jax.random.PRNGKey(3)},
        batch["audio"], batch["visual"], train=False, **kw)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=optimizer.init(variables["params"]))


def batch(b=2):
    r = jax.random.PRNGKey(5)
    return {"audio": jax.random.normal(r, (b, 32, 32, 3)),
            "visual": jax.random.normal(r, (b, 32, 32, 3)),
            "label": jnp.array([0, 3])[:b]}


def test_mmtm_auxi_training_step():
    cfg = Config(dataset="CREMAD", alpha=2.0, learning_rate=0.01,
                 log_grad_csv=False)
    model = MMTMNet(num_classes=6, width=8)
    opt = make_optimizer(cfg, steps_per_epoch=5)
    b = batch()
    state = make_state(model, b, opt, av_inputs=False)
    step = jax.jit(make_auxi_train_step(model, cfg, opt, av_inputs=False))
    losses = []
    for _ in range(3):
        state, metrics = step(state, b)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # params actually updated
    assert int(state.step) == 3


def test_mmformer_n_auxi_with_kl():
    cfg = Config(dataset="CREMAD", alpha=1.0, beta=1e-4, learning_rate=0.01,
                 log_grad_csv=False)
    model = MMFormerN(num_classes=6, width=8, embed_dim=32, seq_len=4)
    opt = make_optimizer(cfg, steps_per_epoch=5)
    b = batch()
    state = make_state(model, b, opt, av_inputs=False)
    step = jax.jit(make_auxi_train_step(model, cfg, opt, seven_tuple=True,
                                        av_inputs=False))
    state, metrics = step(state, b)
    assert np.isfinite(float(metrics["loss"]))
    # the KL term makes total loss exceed the bare CE composition
    bare = (cfg.alpha * (float(metrics["loss_a"]) + float(metrics["loss_v"]))
            + float(metrics["loss_f"]))
    assert float(metrics["loss"]) > bare
