"""Preemption-safe training (utils/preempt.py): SIGTERM → checkpoint at
the next step boundary → exact mid-epoch resume.

The reference cannot resume at all (SURVEY §5.3); round 2 added
epoch-granular --save_every/--resume. These tests cover the round-4b
step-granular story: a run killed mid-epoch and resumed must be BITWISE
identical to the uninterrupted run — possible because the device RNG keys
off the global step counter (train/dgl.py:175), host augmentation draws
are per-(seed, epoch, idx), and the Loader can re-enter an epoch's
deterministic shuffle stream past the already-trained batches
(Loader.skip_next_batches)."""

import os
import signal

import jax
import numpy as np
import pytest
from flax import serialization

from gdl_tpu.config import Config
from gdl_tpu.data.synthetic import SyntheticDataset
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.train.loop import run_training
from gdl_tpu.utils.preempt import PreemptionGuard


def tiny_cfg(tmp_path, subdir="ckpt", **kw):
    base = dict(
        dataset="CREMAD", fusion_method="concat", modulation="Normal",
        alpha=4.0, fps=2, batch_size=8, epochs=2, learning_rate=0.01,
        lr_decay_step=[70], ckpt_path=str(tmp_path / subdir), train=True,
        encoder_width=8, encoder_stages=[1, 1, 1, 1], num_workers=2,
        log_grad_csv=False, random_seed=0, save_every=1,
    )
    base.update(kw)
    return Config(**base)


def test_sigterm_sets_flag():
    """A real SIGTERM delivered to the process trips the installed guard
    (and only the guard — the previous disposition is restored)."""
    guard = PreemptionGuard().install()
    try:
        assert not guard.triggered()
        os.kill(os.getpid(), signal.SIGTERM)
        # the handler runs synchronously in the main thread on return from
        # the kill syscall; poll defensively anyway
        for _ in range(100):
            if guard.triggered():
                break
        assert guard.triggered()
        assert guard.should_stop(1)
    finally:
        guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) != guard.trigger


def test_loader_skip_next_batches(tmp_path):
    """skip_next_batches(k) yields exactly the tail of the same epoch
    stream — identical index groups, no re-shuffle."""
    from gdl_tpu.data.loader import Loader

    cfg = tiny_cfg(tmp_path)
    ds = SyntheticDataset(cfg, size=32, seed=0)  # 4 batches of 8
    full = Loader(ds, 8, shuffle=True, drop_last=True, num_workers=1,
                  seed=0)
    full.set_epoch(3)
    all_labels = [b["label"] for b in full]
    tail = Loader(ds, 8, shuffle=True, drop_last=True, num_workers=1,
                  seed=0)
    tail.set_epoch(3)
    tail.skip_next_batches(2)
    tail_labels = [b["label"] for b in tail]
    assert len(all_labels) == 4 and len(tail_labels) == 2
    for a, b in zip(all_labels[2:], tail_labels):
        np.testing.assert_array_equal(a, b)
    # the skip is one-shot: the next epoch is full-length again
    tail.set_epoch(4)
    assert len(list(tail)) == 4


@pytest.mark.slow
def test_midepoch_preempt_resume_bitwise(tmp_path, monkeypatch):
    """2 epochs straight vs preempt-after-step-2-of-epoch-0 + resume:
    final params, batch stats, optimizer state, and step counter all
    bitwise equal (3 steps/epoch, so the cut is mid-epoch)."""
    monkeypatch.chdir(tmp_path)

    def data(cfg):
        return (SyntheticDataset(cfg, size=24, seed=0),  # 3 steps/epoch
                SyntheticDataset(cfg, size=8, seed=100))

    # A: uninterrupted
    cfg_a = tiny_cfg(tmp_path, "a")
    run_training(cfg_a, AVClassifierDGL(config=cfg_a), *data(cfg_a),
                 dgl=True)

    # B1: preempted after step 2 of epoch 0 (the guard's test hook drives
    # the exact production save path without delivering a signal)
    cfg_b = tiny_cfg(tmp_path, "b")
    guard = PreemptionGuard(trigger_after=2)
    run_training(cfg_b, AVClassifierDGL(config=cfg_b), *data(cfg_b),
                 dgl=True, preempt_guard=guard)
    resume_path = os.path.join(cfg_b.ckpt_path, "resume_state.msgpack")
    with open(resume_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    assert payload["epoch"] == 0
    assert payload["extra"]["step_in_epoch"] == 2
    assert int(np.asarray(payload["state"]["step"])) == 2

    # B2: resume → finishes epoch 0's remaining step, then epoch 1
    cfg_b2 = tiny_cfg(tmp_path, "b", resume=resume_path)
    run_training(cfg_b2, AVClassifierDGL(config=cfg_b2), *data(cfg_b2),
                 dgl=True, preempt_guard=PreemptionGuard())  # never fires

    def final_state(subdir):
        p = os.path.join(str(tmp_path / subdir), "resume_state.msgpack")
        with open(p, "rb") as f:
            return serialization.msgpack_restore(f.read())

    sa, sb = final_state("a"), final_state("b")
    assert sa["epoch"] == sb["epoch"] == 2
    flat_a = jax.tree_util.tree_leaves_with_path(sa["state"])
    flat_b = jax.tree_util.tree_leaves_with_path(sb["state"])
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))


@pytest.mark.slow
def test_resumed_epoch_means_are_full_epoch(tmp_path, monkeypatch):
    """The resumed epoch's reported means must average the WHOLE epoch,
    not just the post-resume tail (ADVICE r4: the preempted run's partial
    per-metric sums are persisted in the resume state's extra and
    re-seeded into the accumulators). Sums re-accumulate in the original
    step order over bitwise-identical step metrics, so the means match
    the uninterrupted run's exactly."""
    monkeypatch.chdir(tmp_path)

    def data(cfg):
        return (SyntheticDataset(cfg, size=24, seed=0),  # 3 steps/epoch
                SyntheticDataset(cfg, size=8, seed=100))

    def capture(store):
        def cb(epoch, means, **kw):
            store[epoch] = dict(means)
        return cb

    # A: uninterrupted single epoch
    means_a = {}
    cfg_a = tiny_cfg(tmp_path, "a", epochs=1)
    run_training(cfg_a, AVClassifierDGL(config=cfg_a), *data(cfg_a),
                 dgl=True, epoch_callback=capture(means_a))

    # B: preempt after step 2 of 3, then resume the final step
    cfg_b = tiny_cfg(tmp_path, "b", epochs=1)
    run_training(cfg_b, AVClassifierDGL(config=cfg_b), *data(cfg_b),
                 dgl=True, preempt_guard=PreemptionGuard(trigger_after=2))
    resume_path = os.path.join(cfg_b.ckpt_path, "resume_state.msgpack")
    with open(resume_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    assert payload["extra"]["step_in_epoch"] == 2
    assert payload["extra"]["partial_sums"], "partial sums not persisted"

    means_b = {}
    cfg_b2 = tiny_cfg(tmp_path, "b", epochs=1, resume=resume_path)
    run_training(cfg_b2, AVClassifierDGL(config=cfg_b2), *data(cfg_b2),
                 dgl=True, preempt_guard=PreemptionGuard(),
                 epoch_callback=capture(means_b))

    assert 0 in means_a and 0 in means_b
    # the resumed run stepped only the tail...
    assert means_b[0]["steps"] == 1 and means_a[0]["steps"] == 3
    # ...but its means cover the full epoch
    metric_keys = [k for k in means_a[0]
                   if k not in ("steps", "wall_time", "preempted", "_sums")]
    assert metric_keys
    for k in metric_keys:
        np.testing.assert_allclose(means_b[0][k], means_a[0][k],
                                   rtol=1e-12, err_msg=k)


@pytest.mark.slow
def test_preempt_on_final_step_rolls_to_next_epoch(tmp_path, monkeypatch):
    """A guard firing on an epoch's LAST step saves (epoch+1, step 0) —
    the epoch's training is complete — and still runs that epoch's eval
    epilogue first (accuracy CSV row, best-ckpt update): the resumed run
    starts at epoch+1 and would otherwise never eval the epoch."""
    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(tmp_path, "c")
    train = SyntheticDataset(cfg, size=16, seed=0)  # 2 steps/epoch
    test = SyntheticDataset(cfg, size=8, seed=100)
    guard = PreemptionGuard(trigger_after=2)
    run_training(cfg, AVClassifierDGL(config=cfg), train, test, dgl=True,
                 preempt_guard=guard)
    with open(os.path.join(cfg.ckpt_path, "resume_state.msgpack"),
              "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    assert payload["epoch"] == 1
    assert payload["extra"]["step_in_epoch"] == 0
    # the completed epoch's eval ran before stopping: sentinel + epoch-0 row
    with open(os.path.join(cfg.ckpt_path, "CREMAD_full.csv")) as f:
        rows = [r for r in f.read().splitlines() if r.strip()]
    assert len(rows) == 2, rows
