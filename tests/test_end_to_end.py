"""End-to-end slice: synthetic CREMA-D-shaped data through the full DGL
training flow (loader → on-device preprocess → jitted train step over the
8-device CPU mesh → eval → CSV + best checkpoint), then checkpoint
round-trip and eval-mode reload — the whole main_dgl.py surface minus real
media."""

import glob
import jax.numpy as jnp
import os

import jax
import numpy as np
import pytest

from gdl_tpu.config import Config
from gdl_tpu.data.loader import Loader
from gdl_tpu.data.synthetic import SyntheticDataset, synthetic_batch
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.train.loop import evaluate, run_eval, run_training
from gdl_tpu.utils.checkpoint import legacy_checkpoint_name


def tiny_cfg(tmp_path, **kw):
    base = dict(
        dataset="CREMAD", fusion_method="concat", modulation="Normal",
        alpha=4.0, fps=2, batch_size=8, epochs=2, learning_rate=0.01,
        lr_decay_step=[70], ckpt_path=str(tmp_path / "ckpt"), train=True,
        encoder_width=8, encoder_stages=[1, 1, 1, 1], num_workers=2,
        log_grad_csv=False, random_seed=0,
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_dgl_training_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(tmp_path)
    model = AVClassifierDGL(config=cfg)
    train_set = SyntheticDataset(cfg, size=24, seed=0)
    test_set = SyntheticDataset(cfg, size=16, seed=100)

    best = run_training(cfg, model, train_set, test_set, dgl=True)

    # accuracy CSV with sentinel row
    csv_path = os.path.join(cfg.ckpt_path, "CREMAD_full.csv")
    assert os.path.exists(csv_path)
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0] == "1000,1000,1000"
    assert len(rows) == 1 + cfg.epochs

    # best checkpoint with the legacy filename pattern (epoch>0 only)
    ckpts = glob.glob(os.path.join(cfg.ckpt_path, "best_model_of_dataset_*"))
    if best > 0:
        assert len(ckpts) <= cfg.epochs - 1
    if ckpts:
        name = os.path.basename(ckpts[0])
        assert name.startswith(
            "best_model_of_dataset_CREMAD_Normal_alpha_4.0optimizer_sgd_"
            "modulate_starts_0_ends_50_epoch_")
        assert name.endswith(".pth")
        # eval-mode reload (main_dgl.py:398-418 flow)
        cfg_eval = tiny_cfg(tmp_path, train=False)
        acc, acc_a, acc_v = run_eval(cfg_eval, model, test_set, ckpts[0],
                                     dgl=True)
        assert 0.0 <= acc <= 1.0


def test_legacy_checkpoint_name_pattern():
    cfg = Config(dataset="CREMAD", modulation="Normal", alpha=5.0,
                 optimizer="sgd", modulation_starts=0, modulation_ends=50)
    name = legacy_checkpoint_name(cfg, epoch=42, acc=0.7812)
    assert name == ("best_model_of_dataset_CREMAD_Normal_alpha_5.0"
                    "optimizer_sgd_modulate_starts_0_ends_50_"
                    "epoch_42_acc_0.7812.pth")


def test_loader_shapes_and_drop_last():
    cfg = Config(dataset="CREMAD", fps=2, encoder_width=8)
    ds = SyntheticDataset(cfg, size=21)
    loader = Loader(ds, batch_size=8, shuffle=True, drop_last=True,
                    num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # 21 // 8, last partial dropped
    b = batches[0]
    assert b["wave"].shape == (8, 66150)
    assert b["frames"].shape == (8, 2, 256, 256, 3)
    assert b["frames"].dtype == np.uint8
    assert b["label"].shape == (8,)

    # no drop_last keeps the tail
    loader2 = Loader(ds, batch_size=8, shuffle=False, drop_last=False,
                     num_workers=2)
    assert sum(len(b["label"]) for b in loader2) == 21


def test_synthetic_batch_matches_dataset_contract():
    cfg = Config(dataset="KineticSound", use_video_frames=3, encoder_width=8)
    batch = synthetic_batch(cfg, 4, n_frames=3)
    assert batch["wave"].shape == (4, 80000)
    assert batch["frames"].shape == (4, 3, 256, 256, 3)
    assert batch["label"].max() < 34


@pytest.mark.slow
def test_save_every_and_resume_continuity(tmp_path, monkeypatch):
    """--save_every writes a resumable TrainState; --resume restarts at the
    saved epoch with identical params (capability the reference lacks,
    SURVEY §5.4)."""
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(tmp_path, epochs=2, save_every=1)
    model = AVClassifierDGL(config=cfg)
    train_set = SyntheticDataset(cfg, size=16, seed=0)
    test_set = SyntheticDataset(cfg, size=8, seed=100)
    run_training(cfg, model, train_set, test_set, dgl=True)

    resume_path = os.path.join(cfg.ckpt_path, "resume_state.msgpack")
    assert os.path.exists(resume_path)

    from gdl_tpu.train.loop import build_harness

    cfg2 = tiny_cfg(tmp_path, epochs=2, resume=resume_path)
    h = build_harness(cfg2, model, steps_per_epoch=2, dgl=True)
    assert h.start_epoch == 2  # saved after the final epoch
    assert int(jax.device_get(h.state.step)) == 4  # 2 epochs x 2 steps


@pytest.mark.slow
def test_resume_equivalence_flagship_width(tmp_path, monkeypatch):
    """VERDICT round-2 item 8: 2 epochs straight vs 1 epoch + save/resume
    + 1 epoch at FLAGSHIP width (64, stages [2,2,2,2]) on fixture data —
    bitwise-equal parameters, batch stats, and step counter. Extends the
    toy-width resume test above to the real model scale (one step per
    epoch keeps the 1-core CPU run tractable; width is what the toy test
    never exercised)."""
    monkeypatch.chdir(tmp_path)

    def cfg_for(subdir, **kw):
        return tiny_cfg(tmp_path, encoder_width=64,
                        encoder_stages=[2, 2, 2, 2], fps=1,
                        ckpt_path=str(tmp_path / subdir), save_every=1,
                        **kw)

    cfg_a = cfg_for("a", epochs=2)
    train_set = SyntheticDataset(cfg_a, size=8, seed=0)  # 1 step/epoch
    test_set = SyntheticDataset(cfg_a, size=8, seed=100)

    run_training(cfg_a, AVClassifierDGL(config=cfg_a), train_set, test_set,
                 dgl=True)

    cfg_b1 = cfg_for("b", epochs=1)
    run_training(cfg_b1, AVClassifierDGL(config=cfg_b1), train_set,
                 test_set, dgl=True)
    resume_path = os.path.join(cfg_b1.ckpt_path, "resume_state.msgpack")
    assert os.path.exists(resume_path)
    cfg_b2 = cfg_for("b", epochs=2, resume=resume_path)
    run_training(cfg_b2, AVClassifierDGL(config=cfg_b2), train_set,
                 test_set, dgl=True)

    from flax import serialization

    def final_state(subdir):
        with open(os.path.join(str(tmp_path / subdir),
                               "resume_state.msgpack"), "rb") as f:
            return serialization.msgpack_restore(f.read())

    sa, sb = final_state("a"), final_state("b")
    assert sa["epoch"] == sb["epoch"] == 2
    flat_a = jax.tree_util.tree_leaves_with_path(sa["state"])
    flat_b = jax.tree_util.tree_leaves_with_path(sb["state"])
    assert len(flat_a) == len(flat_b) > 100
    for (pa, la), (_, lb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


def test_visual_time_pooling_semantics():
    """The visual fold [B,T,...]→[B·T,...] and unfold-with-mean must equal
    a plain per-frame mean (basic_model.py:73-82 reshape/permute chain)."""
    from gdl_tpu.models.classifier import _pool_visual

    b, t, h, w, c = 2, 3, 4, 4, 5
    rng = np.random.default_rng(0)
    per_frame = rng.standard_normal((b, t, h, w, c)).astype(np.float32)
    folded = jnp.asarray(per_frame.reshape(b * t, h, w, c))
    pooled = np.asarray(_pool_visual(folded, b))
    ref = per_frame.mean(axis=(1, 2, 3))
    np.testing.assert_allclose(pooled, ref, rtol=1e-6)


@pytest.mark.slow
def test_eval_without_drop_last_pads_ragged_batch(tmp_path, monkeypatch):
    """--eval_drop_last 0 evaluates the FULL test set (the reference's
    drop_last=True truncates it, SURVEY §5.5) even when the final batch is
    ragged and wouldn't divide the 8-device mesh."""
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(tmp_path, epochs=1, eval_drop_last=False)
    model = AVClassifierDGL(config=cfg)
    train_set = SyntheticDataset(cfg, size=16, seed=0)
    test_set = SyntheticDataset(cfg, size=11, seed=100)  # 8 + ragged 3
    run_training(cfg, model, train_set, test_set, dgl=True)

    from gdl_tpu.train.loop import Loader, build_harness, evaluate

    h = build_harness(cfg, model, steps_per_epoch=2, dgl=True)
    loader = Loader(test_set, cfg.batch_size, shuffle=False, drop_last=False,
                    num_workers=2)
    from gdl_tpu.utils.metrics import PerClassAccuracy
    # the accounting must cover all 11 samples
    counters = PerClassAccuracy(cfg.n_classes)
    total = 0
    for batch in loader:
        total += len(batch["label"])
    assert total == 11
    acc, _, _ = evaluate(h, loader)
    assert 0.0 <= acc <= 1.0


def test_batch_size_must_divide_mesh(tmp_path):
    from gdl_tpu.train.loop import build_harness

    cfg = tiny_cfg(tmp_path, batch_size=9)  # 9 % 8 != 0
    model = AVClassifierDGL(config=cfg)
    with pytest.raises(ValueError, match="must divide"):
        build_harness(cfg, model, steps_per_epoch=2, dgl=True)


@pytest.mark.slow
def test_profile_dir_writes_trace(tmp_path, monkeypatch):
    """--profile_dir captures a jax.profiler trace of early steps
    (SURVEY §5.1 — the reference has no profiling at all)."""
    monkeypatch.chdir(tmp_path)
    prof = tmp_path / "prof"
    cfg = tiny_cfg(tmp_path, epochs=1, profile_dir=str(prof))
    model = AVClassifierDGL(config=cfg)
    # 13 batches so the trace window (steps 10-12) is exercised
    train_set = SyntheticDataset(cfg, size=13 * cfg.batch_size, seed=0)
    test_set = SyntheticDataset(cfg, size=8, seed=100)
    run_training(cfg, model, train_set, test_set, dgl=True)
    traces = glob.glob(str(prof / "**" / "*.xplane.pb"), recursive=True)
    assert traces, "no profiler trace written"


@pytest.mark.slow
def test_ave_config_trains(tmp_path, monkeypatch):
    """AVE geometry: 22.05 kHz/512/256 STFT np.resize'd to 224² flows
    through the whole training path (AVEDataset.py:81-88 semantics)."""
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(tmp_path, dataset="AVE", epochs=1, fps=1)
    cfg.num_frame = 1
    model = AVClassifierDGL(config=cfg)
    train_set = SyntheticDataset(cfg, size=16, n_frames=1, seed=0)
    test_set = SyntheticDataset(cfg, size=8, n_frames=1, seed=100)
    run_training(cfg, model, train_set, test_set, dgl=True)
    assert os.path.exists(os.path.join(cfg.ckpt_path, "AVE_full.csv"))
