"""AVClassifierSwin (main.py --backbone swin path): 11-tuple contract with
the Swin PE branch, and a joint train step over the swin classifier."""

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.config import Config
from gdl_tpu.models.classifier import AVClassifierSwin
from gdl_tpu.train.joint import make_joint_train_step
from gdl_tpu.train.optim import make_optimizer
from gdl_tpu.train.dgl import create_train_state

SWIN_TINY = dict(swin_embed_dim=16, swin_depths=[1, 1], swin_heads=[2, 4],
                 swin_window=4, swin_img_size=32, swin_patch=4,
                 backbone="swin", log_grad_csv=False)


def tiny_batch(b=2):
    r = jax.random.PRNGKey(0)
    return {
        "audio": jax.random.normal(r, (b, 32, 32, 1)),
        "visual": jax.random.normal(r, (b, 2, 32, 32, 3)),
        "label": jnp.array([0, 5])[:b],
    }


def test_swin_classifier_eleven_tuple_pe():
    cfg = Config(dataset="CREMAD", fusion_method="concat", pe=1, **SWIN_TINY)
    model = AVClassifierSwin(config=cfg)
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["audio"], batch["visual"], train=False)
    out = model.apply(variables, batch["audio"], batch["visual"],
                      train=False)
    assert len(out) == 11
    a, v, logits, a_feat, v_feat, a_mul, a_std, v_mul, v_std, oa, ov = out
    assert logits.shape == (2, 6)
    assert a.shape == (2, 32)  # embed 16 * 2^(2-1)
    assert a_mul.ndim == 4 and np.all(np.asarray(a_std) > 0)


def test_swin_classifier_pe0_sentinel():
    cfg = Config(dataset="CREMAD", fusion_method="concat", pe=0, **SWIN_TINY)
    model = AVClassifierSwin(config=cfg)
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["audio"], batch["visual"], train=False)
    out = model.apply(variables, batch["audio"], batch["visual"],
                      train=False)
    assert isinstance(out[5], int) and out[5] == 0


def test_swin_joint_train_step():
    cfg = Config(dataset="CREMAD", fusion_method="concat", pe=1, beta=1e-4,
                 alpha=1.0, modulation="Normal", learning_rate=0.01,
                 **SWIN_TINY)
    model = AVClassifierSwin(config=cfg)
    opt = make_optimizer(cfg, steps_per_epoch=5)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt,
                               spec_shape=(32, 32), frames=2, image_size=32)
    step = jax.jit(make_joint_train_step(model, cfg, opt, steps_per_epoch=5))
    batch = tiny_batch()
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
