"""Learnability sanity: the DGL step actually LEARNS — on synthetic
separable data (class-dependent tones + class-dependent frame brightness)
a few dozen steps lift train accuracy well above chance, and both unimodal
heads learn (the DGL property: encoders train through the AUXI stream).
Also covers the unimodal --modality audio/visual driver paths."""

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.config import Config
from gdl_tpu.data.preprocess import make_train_preprocess
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.train.dgl import (
    create_train_state,
    dgl_loss_fn,
    make_dgl_train_step,
)
from gdl_tpu.train.optim import make_optimizer

TINY = dict(encoder_width=8, encoder_stages=[1, 1, 1, 1], fps=1,
            log_grad_csv=False)


def separable_batch(key, b=16, n_classes=4, n=22050 * 3, img=48):
    """Audio: class-dependent pure tone; frames: class-dependent gray."""
    kl, kn = jax.random.split(key)
    labels = jax.random.randint(kl, (b,), 0, n_classes)
    t = jnp.arange(n) / 22050.0
    freqs = 200.0 * (1.0 + labels[:, None].astype(jnp.float32))
    wave = 0.5 * jnp.sin(2 * jnp.pi * freqs * t[None, :])
    wave = wave + 0.01 * jax.random.normal(kn, wave.shape)
    gray = (40 + 50 * labels).astype(jnp.uint8)
    frames = jnp.broadcast_to(gray[:, None, None, None, None],
                              (b, 1, img, img, 3)).astype(jnp.uint8)
    return {"wave": wave.astype(jnp.float32), "frames": frames,
            "label": labels}


def test_dgl_training_learns_both_modalities():
    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=2.0,
                 learning_rate=0.05, lr_decay_step=[1000], **TINY)
    model = AVClassifierDGL(config=cfg)
    opt = make_optimizer(cfg, steps_per_epoch=1000)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, opt, image_size=48)
    pre = make_train_preprocess(cfg, image_size=48)
    step = jax.jit(make_dgl_train_step(model, cfg, opt, preprocess=pre,
                                       base_rng=rng))

    batch = separable_batch(jax.random.PRNGKey(1))
    first_loss = None
    for i in range(40):
        state, metrics = step(state, batch)
        if first_loss is None:
            first_loss = float(metrics["loss_f"])
    # evaluate on the SAME batch (memorization is the point here)
    proc = pre(batch, jax.random.PRNGKey(2))
    out, out_a, out_v = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        proc["audio"], proc["visual"], train=False)
    acc = float(jnp.mean(jnp.argmax(out, -1) == batch["label"]))
    acc_a = float(jnp.mean(jnp.argmax(out_a, -1) == batch["label"]))
    acc_v = float(jnp.mean(jnp.argmax(out_v, -1) == batch["label"]))
    assert float(metrics["loss_f"]) < first_loss
    assert acc >= 0.75, f"fused head failed to learn: {acc}"
    # the DGL property in action: the encoders learned THROUGH the
    # unimodal AUXI stream, so both unimodal heads must be above chance
    assert acc_a >= 0.5, f"audio stream failed to learn: {acc_a}"
    assert acc_v >= 0.5, f"visual stream failed to learn: {acc_v}"


def test_unimodal_modality_paths_train():
    for modality in ("audio", "visual"):
        cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=1.0,
                     modality=modality, learning_rate=0.05, **TINY)
        model = AVClassifierDGL(config=cfg)
        opt = make_optimizer(cfg, steps_per_epoch=100)
        rng = jax.random.PRNGKey(0)
        state = create_train_state(model, cfg, rng, opt, image_size=48)
        pre = make_train_preprocess(cfg, image_size=48)
        step = jax.jit(make_dgl_train_step(model, cfg, opt, preprocess=pre,
                                           base_rng=rng))
        batch = separable_batch(jax.random.PRNGKey(3), b=8)
        losses = []
        for _ in range(10):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss_f"]))
        assert losses[-1] < losses[0], f"{modality} path did not learn"
        # classifier param subtree exists, fusion does not
        assert f"{modality}_classifier" in state.params
        assert "fusion_module" not in state.params


def test_ks_shaped_loss_compiles():
    """KineticSound spectrogram geometry [129, 626] through the DGL loss."""
    cfg = Config(dataset="KineticSound", fusion_method="concat", alpha=1.0,
                 use_video_frames=2, **{**TINY, "fps": 2})
    model = AVClassifierDGL(config=cfg)
    r = jax.random.PRNGKey(0)
    batch = {
        "audio": jax.random.normal(r, (2, 129, 626, 1)),
        "visual": jax.random.normal(r, (2, 2, 32, 32, 3)),
        "label": jnp.array([0, 33]),
    }
    variables = model.init({"params": r}, batch["audio"], batch["visual"],
                           train=False)
    loss, (_, metrics) = dgl_loss_fn(model, variables["params"],
                                     variables["batch_stats"], batch, cfg,
                                     train=False)
    assert np.isfinite(float(loss))
    assert metrics["out"].shape == (2, 34)
