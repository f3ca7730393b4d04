"""Checkpoint round-trip (SURVEY §3.6 schema + §4.4) and the resume
capability the reference lacks (§5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdl_tpu.config import Config
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.train.dgl import create_train_state
from gdl_tpu.train.optim import make_optimizer
from gdl_tpu.utils.checkpoint import (
    load_legacy_checkpoint,
    load_train_state,
    restore_params_into_state,
    save_legacy_checkpoint,
    save_train_state,
)

TINY = dict(encoder_width=8, encoder_stages=[1, 1, 1, 1], fps=1)


def make_state(tmp_path, **kw):
    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=5.0,
                 modulation="Normal", optimizer="sgd",
                 ckpt_path=str(tmp_path / "ckpt"), **TINY, **kw)
    model = AVClassifierDGL(config=cfg)
    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), optimizer,
                               image_size=32)
    return cfg, model, optimizer, state


def test_legacy_schema_roundtrip(tmp_path):
    cfg, model, optimizer, state = make_state(tmp_path)
    path = save_legacy_checkpoint(cfg, state, epoch=7, acc=0.777)
    assert os.path.basename(path) == (
        "best_model_of_dataset_CREMAD_Normal_alpha_5.0optimizer_sgd_"
        "modulate_starts_0_ends_50_epoch_7_acc_0.777.pth")

    loaded = load_legacy_checkpoint(path, cfg)
    # the reference dict keys (main_dgl.py:366-382)
    assert set(loaded) == {"saved_epoch", "modulation", "alpha", "fusion",
                           "acc", "model", "optimizer", "scheduler"}
    assert loaded["saved_epoch"] == 7
    assert loaded["modulation"] == "Normal"
    assert loaded["fusion"] == "concat"
    assert np.isclose(loaded["alpha"], 5.0)
    assert np.isclose(loaded["acc"], 0.777)

    # strict=False-style restore: arrays equal after the round trip
    state2 = restore_params_into_state(state, loaded)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_compat_asserts(tmp_path):
    cfg, model, optimizer, state = make_state(tmp_path)
    path = save_legacy_checkpoint(cfg, state, epoch=1, acc=0.5)
    bad = Config(dataset="CREMAD", fusion_method="gated",
                 modulation="Normal", ckpt_path=cfg.ckpt_path, **TINY)
    with pytest.raises(AssertionError, match="fusion"):
        load_legacy_checkpoint(path, bad)
    bad2 = Config(dataset="CREMAD", fusion_method="concat",
                  modulation="OGM_GE", ckpt_path=cfg.ckpt_path, **TINY)
    with pytest.raises(AssertionError, match="modulation"):
        load_legacy_checkpoint(path, bad2)


def test_full_train_state_resume(tmp_path):
    """New capability (reference can't resume mid-run, SURVEY §5.3/5.4):
    the FULL state — params, BN stats, optimizer momentum, step — survives."""
    cfg, model, optimizer, state = make_state(tmp_path)
    # mutate so the state is non-trivial
    state = state.replace(
        step=jnp.asarray(123, jnp.int32),
        params=jax.tree.map(lambda x: x + 1.5, state.params))
    path = str(tmp_path / "resume.msgpack")
    save_train_state(path, state, epoch=9, extra={"best_acc": 0.7})

    _, _, _, fresh = make_state(tmp_path)
    restored, epoch, extra = load_train_state(path, fresh)
    assert epoch == 9
    assert extra["best_acc"] == 0.7
    assert int(restored.step) == 123
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_manager_roundtrip(tmp_path):
    """Async orbax backend: save/restore the full TrainState."""
    from gdl_tpu.utils.checkpoint import OrbaxCheckpointManager

    cfg, model, optimizer, state = make_state(tmp_path)
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    mgr = OrbaxCheckpointManager(str(tmp_path / "orbax"), max_to_keep=2)
    mgr.save(epoch=5, state=state, wait=True)

    _, _, _, fresh = make_state(tmp_path)
    restored, epoch = mgr.restore(fresh)
    assert epoch == 5
    assert int(restored.step) == 42
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()
