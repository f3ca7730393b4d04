"""Full multi-epoch training-loop equivalence vs the torch reference
(VERDICT r3 item 1).

The torch side drives the reference's OWN `train_epoch` and `valid`
functions — imported from /root/reference/main_dgl.py with only the
librosa-dependent dataset modules stubbed — plus its best-checkpoint
selection rule (main_dgl.py:300-396: epoch-top MultiStepLR stepping,
`if acc > best_acc and epoch`). Our side is the production `run_training`
(gdl_tpu/train/loop.py) end-to-end: Loader, jit train step, evaluate,
CSV, best-ckpt saving. Both start from identical weights and consume the
IDENTICAL batch stream (the torch side replays our Loader's seeded
shuffle), for 4 tiny-width epochs spanning an lr_decay_step milestone.

Must agree: per-epoch mean train losses, per-epoch eval accuracy triples
(exact — discrete counts), the LR actually applied each epoch (exact),
BN running statistics after 4 epochs of accumulation, final params, and
WHICH epochs produced a best checkpoint. This converts the step-level
trajectory parity (test_trajectory_parity.py) into *training* parity —
the integration layer where the round-3 resume bug lived.
"""

import importlib.util
import os
import re
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn as tnn

from gdl_tpu.config import Config
from tests.test_torch_interop import (
    N_CLASSES,
    STAGES,
    WIDTH,
    TorchAVClassifierDGL,
)

REF = "/root/reference/main_dgl.py"
EPOCHS = 4
BATCH = 4
TRAIN_N = 16  # 4 steps/epoch
EVAL_N = 8    # 2 eval batches
MILESTONE = 3  # lr decays at the top of epoch 2 (the epoch-top quirk)
LR = 1e-4
ALPHA = 4.0
SPEC = (32, 24)
HW = 32
FRAMES = 2


def _import_reference_main_dgl():
    """Import the reference driver module itself. Its dataset imports pull
    librosa (absent here) — stub exactly those modules; train_epoch/valid
    and the torch/np machinery they use are imported REAL."""
    names = ("dataset", "models", "utils",
             "dataset.CramedDataset", "dataset.KSDataset",
             "dataset.VGGSoundDataset", "dataset.AVEDataset",
             "dataset.Kinect400", "models.basic_model", "utils.utils")
    saved = {k: sys.modules.get(k) for k in names}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m

    try:
        stub("dataset")
        stub("models")
        stub("utils")
        stub("dataset.CramedDataset", CramedDataset=object,
             CramedDataset_swin=object)
        stub("dataset.KSDataset", KSDataset=object)
        stub("dataset.VGGSoundDataset", VGGSound=object)
        stub("dataset.AVEDataset", AVEDataset=object)
        stub("dataset.Kinect400", Kinect400=object)
        stub("models.basic_model", AVClassifier_DGL=object)
        stub("utils.utils", setup_seed=lambda s: None,
             weight_init=lambda m: None)
        spec = importlib.util.spec_from_file_location("ref_main_dgl", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


class _PreTensorSet:
    """In-memory preprocessed dataset: per-sample dicts matching the
    raw_batches=False step contract. Class-templated so training moves
    accuracy (best-ckpt selection is non-vacuous)."""

    def __init__(self, n, seed):
        rng = np.random.default_rng(seed)
        ta = rng.standard_normal((N_CLASSES,) + SPEC + (1,))
        tv = rng.standard_normal((N_CLASSES, FRAMES, HW, HW, 3))
        self.label = rng.integers(0, N_CLASSES, n)
        self.audio = (0.8 * ta[self.label] + rng.standard_normal(
            (n,) + SPEC + (1,))).astype(np.float32)
        self.visual = (0.8 * tv[self.label] + rng.standard_normal(
            (n, FRAMES, HW, HW, 3))).astype(np.float32)

    def __len__(self):
        return len(self.label)

    def __getitem__(self, i):
        return {"audio": self.audio[i], "visual": self.visual[i],
                "label": np.int32(self.label[i])}


class _RefOrderModel(TorchAVClassifierDGL):
    """The reference AVClassifier_DGL output order (out, out_a, out_v) —
    main_dgl.py:103 — over the proven torch replica (same param names:
    audio_net / visual_net / fusion_module, so train_epoch's grad-erasure
    name match and encoder grad probes hit the same tensors)."""

    def forward(self, spec, image):
        out_a, out_v, out = super().forward(spec, image)
        return out, out_a, out_v


def _loader_batches(dataset, cfg, epoch, shuffle, drop_last):
    """Replay OUR Loader's exact batch stream (seeded shuffle + epoch
    advance) as torch tensors shaped for the reference functions:
    spec [B,F,T] (train_epoch unsqueezes the channel), image [B,3,T,H,W]."""
    from gdl_tpu.data.loader import Loader

    loader = Loader(dataset, cfg.batch_size, shuffle=shuffle,
                    drop_last=drop_last, num_workers=1,
                    seed=cfg.random_seed)
    loader.set_epoch(epoch)
    out = []
    for b in loader:
        spec = torch.from_numpy(b["audio"][..., 0].copy())
        image = torch.from_numpy(
            b["visual"].transpose(0, 4, 1, 2, 3).copy())
        label = torch.from_numpy(b["label"].astype(np.int64))
        out.append((spec, image, label))
    return out


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
def test_full_training_loop_matches_reference(tmp_path, monkeypatch):
    import jax

    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.loop import run_training
    from gdl_tpu.train.optim import make_optimizer
    from gdl_tpu.utils.seed import setup_seed
    from gdl_tpu.utils.torch_interop import flax_to_torch_state_dict

    monkeypatch.chdir(tmp_path)  # train_epoch writes its grad CSV to CWD

    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 modulation="Normal", fps=FRAMES, batch_size=BATCH,
                 alpha=ALPHA, learning_rate=LR, optimizer="sgd",
                 lr_decay_step=[MILESTONE], lr_decay_ratio=0.1,
                 epochs=EPOCHS, encoder_width=WIDTH,
                 encoder_stages=list(STAGES), num_workers=1, dp=1,
                 log_grad_csv=False, ckpt_path=str(tmp_path / "ours"),
                 save_every=0, use_tensorboard=False)

    train_set = _PreTensorSet(TRAIN_N, seed=11)
    test_set = _PreTensorSet(EVAL_N, seed=12)

    # ---- identical initial weights on both sides ----
    model = AVClassifierDGL(config=cfg)
    init_state = create_train_state(
        model, cfg, setup_seed(cfg.random_seed),
        make_optimizer(cfg, TRAIN_N // BATCH))
    sd = flax_to_torch_state_dict(init_state.params,
                                  init_state.batch_stats, prefix="")
    tmodel = _RefOrderModel()
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                            for k, v in sd.items()}, strict=True)
    tmodel.args = SimpleNamespace(drop=0)  # valid() toggles this

    # ---- torch side: the reference's imported loop ----
    ref = _import_reference_main_dgl()
    args = SimpleNamespace(alpha=ALPHA, epochs=EPOCHS, dataset="CREMAD")
    dp = torch.nn.DataParallel(tmodel)  # empty device_ids on CPU: forward
    # falls through to the module; gives the 'module.' name prefix the
    # reference's split('.')[1] fusion-grad erasure expects
    assert not dp.device_ids
    opt = torch.optim.SGD(dp.parameters(), lr=LR, momentum=0.9,
                          weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, [MILESTONE], cfg.lr_decay_ratio)
    eval_batches = _loader_batches(test_set, cfg, 0, shuffle=False,
                                   drop_last=True)
    ref_epochs = []
    best_acc, ref_best = 0.0, []
    for epoch in range(EPOCHS):
        batches = _loader_batches(train_set, cfg, epoch, shuffle=True,
                                  drop_last=True)
        loss_f, loss_a, loss_v = ref.train_epoch(
            args, epoch, dp, torch.device("cpu"), batches, opt, sched)[:3]
        lr_now = opt.param_groups[0]["lr"]
        acc, acc_a, acc_v = ref.valid(args, dp, torch.device("cpu"),
                                      eval_batches)
        ref_epochs.append(dict(loss_f=loss_f, loss_a=loss_a, loss_v=loss_v,
                               lr=lr_now, acc=(acc, acc_a, acc_v)))
        if acc > best_acc and epoch:  # main_dgl.py:349
            best_acc = float(acc)
            ref_best.append((epoch, acc))

    # ---- our side: the production run_training, end to end ----
    ours = []
    run_training(cfg, model, train_set, test_set, dgl=True,
                 raw_batches=False,
                 epoch_callback=lambda **kw: ours.append(kw))

    assert len(ours) == EPOCHS
    worst_loss_dev = 0.0
    for e, (r, o) in enumerate(zip(ref_epochs, ours)):
        # LR actually applied: exact (the epoch-top MultiStepLR quirk
        # integrated across the milestone)
        np.testing.assert_allclose(o["lr"], r["lr"], rtol=1e-12,
                                   err_msg=f"lr epoch {e}")
        # epoch-mean train losses track; fp chaos compounds with steps
        tol = 3e-4 * 3.0 ** e
        for k in ("loss_f", "loss_a", "loss_v"):
            dev = abs(float(o["means"][k]) - r[k]) / max(abs(r[k]), 1e-9)
            worst_loss_dev = max(worst_loss_dev, dev)
            np.testing.assert_allclose(float(o["means"][k]), r[k],
                                       rtol=tol, atol=tol,
                                       err_msg=f"{k} epoch {e}")
        # eval accuracies are discrete counts over the same 8 samples:
        # EXACT equality, every epoch (BN running-stat accumulation,
        # model.eval() semantics, per-class accounting all integrated)
        assert o["acc"] == tuple(r["acc"]), (
            f"eval acc diverged at epoch {e}: {o['acc']} vs {r['acc']}")

    # ---- best-checkpoint selection: same epochs, same accs ----
    pat = re.compile(r"epoch_(\d+)_acc_([0-9.]+)\.pth$")
    ours_saved = sorted(
        (int(m.group(1)), float(m.group(2)))
        for f in os.listdir(cfg.ckpt_path)
        for m in [pat.search(f)] if m)
    assert ours_saved == [(e, pytest.approx(a)) for e, a in ref_best], (
        f"best-ckpt selection diverged: {ours_saved} vs {ref_best}")
    assert ref_best, "no best checkpoint was ever saved — vacuous run"

    # ---- CSV artifact: sentinel + one acc row per epoch ----
    csv_path = os.path.join(cfg.ckpt_path, "CREMAD_full.csv")
    rows = [line.strip().split(",") for line in open(csv_path)]
    assert rows[0] == ["1000", "1000", "1000"]
    assert len(rows) == 1 + EPOCHS

    # ---- final params + BN running stats after 4 epochs ----
    final = ours[-1]["state"]
    got = flax_to_torch_state_dict(
        jax.device_get(final.params), jax.device_get(final.batch_stats),
        prefix="")
    want = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    worst_p, worst_rm, worst_rv = 0.0, 0.0, 0.0
    for k, v in got.items():
        if k.endswith("num_batches_tracked"):
            continue
        d = float(np.max(np.abs(v - want[k])))
        if k.endswith("running_mean"):
            worst_rm = max(worst_rm, d)
        elif k.endswith("running_var"):
            # both sides now store torch's UNBIASED batch variance
            worst_rv = max(worst_rv, d / max(float(np.max(np.abs(want[k]))),
                                             1e-9))
        else:
            worst_p = max(worst_p, d)
    assert worst_p < 2e-2, f"param divergence {worst_p} after 4 epochs"
    assert worst_rm < 2e-3, f"BN running-mean divergence {worst_rm}"
    assert worst_rv < 2e-3, f"BN running-var rel divergence {worst_rv}"
    print(f"full-loop parity: worst loss dev {worst_loss_dev:.2e}, "
          f"param {worst_p:.2e}, bn mean {worst_rm:.2e}, "
          f"bn var rel {worst_rv:.2e}, best epochs "
          f"{[e for e, _ in ref_best]}")


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
def test_reference_loop_is_live(tmp_path, monkeypatch):
    """Guard against a vacuous oracle: the imported train_epoch must move
    params, clip grads, erase fusion grads, and step the scheduler."""
    monkeypatch.chdir(tmp_path)
    ref = _import_reference_main_dgl()
    tmodel = _RefOrderModel()
    tmodel.args = SimpleNamespace(drop=0)
    dp = torch.nn.DataParallel(tmodel)
    opt = torch.optim.SGD(dp.parameters(), lr=1e-2, momentum=0.9,
                          weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, [1], 0.1)
    rng = np.random.default_rng(3)
    batches = [(torch.from_numpy(rng.standard_normal(
                    (BATCH,) + SPEC).astype(np.float32)),
                torch.from_numpy(rng.standard_normal(
                    (BATCH, 3, FRAMES, HW, HW)).astype(np.float32)),
                torch.from_numpy(rng.integers(0, N_CLASSES, BATCH)))
               for _ in range(2)]
    before = {k: v.clone() for k, v in tmodel.state_dict().items()}
    args = SimpleNamespace(alpha=ALPHA, epochs=2, dataset="CREMAD")
    ref.train_epoch(args, 0, dp, torch.device("cpu"), batches, opt, sched)
    # milestone 1 decays at the TOP of epoch 0 — scheduler.step() runs
    # before any training (the epoch-top quirk: milestone m decays
    # epoch m-1), matching lr_for_epoch's epoch+1 >= m
    assert opt.param_groups[0]["lr"] == pytest.approx(1e-3)
    ref.train_epoch(args, 1, dp, torch.device("cpu"), batches, opt, sched)
    assert opt.param_groups[0]["lr"] == pytest.approx(1e-3)
    after = tmodel.state_dict()
    moved = sum(float((before[k] - after[k]).abs().sum())
                for k in before if k.endswith("weight"))
    assert moved > 0
    assert os.path.exists("audio_visual_grad_vanilla.csv")  # probes live
