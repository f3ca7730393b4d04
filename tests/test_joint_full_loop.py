"""Full multi-epoch training-loop equivalence for the JOINT (main.py)
lineage — extends test_full_loop_parity.py's DGL coverage to the other
driver family.

The torch side is the reference main.py loop semantics inline (the
imported-train_epoch trick is impossible here: the reference model draws
its PE noise internally, so the loop runs with pe=0/OGM, which draws NO
randomness — every remaining piece is deterministic): warmup LR stepped
at each epoch top (GradualWarmupScheduler(multiplier=1), main.py:131-132,
:390-391), CE loss (main.py:175-181), backward + clip_grad_norm_(40)
(main.py:240), the live OGM conv-grad modulation inside the epoch window
(main.py:286-332), SGD(momentum=0.9, wd=1e-4) (main.py:510), eval with
the per-class accounting where valid() overwrites out_a/out_v with out
(main.py:459-460), and the best-checkpoint rule (acc > best and epoch).

Our side is the production `run_training(dgl=False)` end-to-end: Loader,
jit joint train step (clip -> modulate order), joint eval step, CSV,
best-ckpt saving. Both start from identical weights and consume the
identical replayed batch stream for 4 epochs whose OGM window [1, 2]
opens and closes mid-run.
"""

import os
import re
from types import SimpleNamespace

import numpy as np
import pytest
import torch
import torch.nn as tnn

from gdl_tpu.config import Config
from tests.test_full_loop_parity import _loader_batches, _PreTensorSet
from tests.test_full_loop_parity import (  # noqa: F401 (shape constants)
    BATCH,
    EVAL_N,
    FRAMES,
    HW,
    SPEC,
    TRAIN_N,
)
from tests.test_joint_trajectory_parity import TorchJointFusion
from tests.test_torch_interop import N_CLASSES, STAGES, WIDTH, TorchRefResNet

EPOCHS = 4
MOD_START, MOD_END = 1, 2  # OGM window opens/closes mid-run
ALPHA = 0.8
LR = 1e-3
TOTAL_EPOCH = 8  # warmup never completes inside the 4 epochs


class TorchJointNoPE(tnn.Module):
    """Torch mirror of gdl_tpu AVClassifier at pe=0: encoders + baseline
    concat fusion + the zero-the-other-modality diagnostic logits."""

    def __init__(self):
        super().__init__()
        self.audio_net = TorchRefResNet(1, WIDTH, STAGES)
        self.visual_net = TorchRefResNet(3, WIDTH, STAGES)
        self.fusion_module = TorchJointFusion()

    def forward(self, spec, image):
        a_map = self.audio_net(spec)
        B, C3, T, H, W = image.shape
        v_map = self.visual_net(
            image.permute(0, 2, 1, 3, 4).reshape(B * T, C3, H, W))
        a = torch.flatten(tnn.functional.adaptive_avg_pool2d(a_map, 1), 1)
        _, C, h, w = v_map.shape
        v = v_map.view(B, T, C, h, w).mean(dim=(1, 3, 4))
        _, _, out = self.fusion_module(a, v)
        _, _, out_a = self.fusion_module(a, torch.zeros_like(v))
        _, _, out_v = self.fusion_module(torch.zeros_like(a), v)
        return out, out_a, out_v


def _warmup_lr(epoch):
    e = epoch + 1
    return LR * min(float(e), TOTAL_EPOCH) / TOTAL_EPOCH


def _torch_ogm_modulate(model, out_a, out_v, label, in_window,
                        applied_coeffs):
    """main.py:287-318 (OGM, no GE): conv grads of the stronger modality
    scaled by 1 - tanh(alpha * relu(ratio))."""
    softmax = tnn.Softmax(dim=1)
    score_v = sum(softmax(out_v)[i][label[i]] for i in range(out_v.size(0)))
    score_a = sum(softmax(out_a)[i][label[i]] for i in range(out_a.size(0)))
    ratio_v = score_v / score_a
    ratio_a = 1 / ratio_v
    if ratio_v > 1:
        coeff_v = 1 - torch.tanh(ALPHA * torch.relu(ratio_v)).item()
        coeff_a = 1.0
    else:
        coeff_a = 1 - torch.tanh(ALPHA * torch.relu(ratio_a)).item()
        coeff_v = 1.0
    if not in_window:
        return
    applied_coeffs.append(min(coeff_a, coeff_v))
    for name, parms in model.named_parameters():
        layer = name.split(".")[0]
        if "audio" in layer and parms.grad.dim() == 4:
            parms.grad = parms.grad * coeff_a
        elif "visual" in layer and parms.grad.dim() == 4:
            parms.grad = parms.grad * coeff_v


def test_joint_full_training_loop_matches_reference(tmp_path, monkeypatch):
    import jax

    from gdl_tpu.models.classifier import AVClassifier
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.loop import run_training
    from gdl_tpu.train.optim import make_optimizer
    from gdl_tpu.utils.metrics import PerClassAccuracy
    from gdl_tpu.utils.seed import setup_seed
    from gdl_tpu.utils.torch_interop import flax_to_torch_state_dict

    monkeypatch.chdir(tmp_path)

    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 modulation="OGM", modulation_starts=MOD_START,
                 modulation_ends=MOD_END, alpha=ALPHA, pe=0, drop=0,
                 fps=FRAMES, batch_size=BATCH, learning_rate=LR,
                 optimizer="sgd", warmup=True, total_epoch=TOTAL_EPOCH,
                 lr_decay_step=[10 ** 6], epochs=EPOCHS,
                 encoder_width=WIDTH, encoder_stages=list(STAGES),
                 num_workers=1, dp=1, log_grad_csv=False,
                 ckpt_path=str(tmp_path / "ours"), save_every=0,
                 use_tensorboard=False)

    train_set = _PreTensorSet(TRAIN_N, seed=21)
    test_set = _PreTensorSet(EVAL_N, seed=22)

    # ---- identical initial weights ----
    model = AVClassifier(config=cfg)
    init_state = create_train_state(
        model, cfg, setup_seed(cfg.random_seed),
        make_optimizer(cfg, TRAIN_N // BATCH, clip_norm=None))
    sd = flax_to_torch_state_dict(init_state.params,
                                  init_state.batch_stats, prefix="")
    tmodel = TorchJointNoPE()
    tmodel.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                            for k, v in sd.items()}, strict=True)

    # ---- torch side: main.py loop semantics, inline ----
    criterion = tnn.CrossEntropyLoss()
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=0.9,
                          weight_decay=1e-4)
    eval_batches = _loader_batches(test_set, cfg, 0, shuffle=False,
                                   drop_last=True)
    ref_epochs, applied_coeffs = [], []
    best_acc, ref_best = 0.0, []
    for epoch in range(EPOCHS):
        for g in opt.param_groups:  # scheduler stepped at the epoch TOP
            g["lr"] = _warmup_lr(epoch)
        tmodel.train()
        losses = []
        for spec, image, label in _loader_batches(train_set, cfg, epoch,
                                                  shuffle=True,
                                                  drop_last=True):
            # train_epoch unsqueezes the spec channel (main.py:160)
            out, out_a, out_v = tmodel(spec.unsqueeze(1), image)
            loss = criterion(out, label)
            opt.zero_grad()
            loss.backward()
            tnn.utils.clip_grad_norm_(tmodel.parameters(), max_norm=40,
                                      norm_type=2)
            _torch_ogm_modulate(tmodel, out_a, out_v, label,
                                MOD_START <= epoch <= MOD_END,
                                applied_coeffs)
            opt.step()
            losses.append(float(loss.detach()))
        tmodel.eval()
        counters = PerClassAccuracy(N_CLASSES)
        with torch.no_grad():
            for spec, image, label in eval_batches:
                out, _, _ = tmodel(spec.unsqueeze(1), image)
                pred = out.argmax(dim=1).numpy()
                # valid() overwrites out_a/out_v with out (main.py:459-460)
                counters.update(pred, pred, pred, label.numpy())
        acc = counters.results()
        ref_epochs.append(dict(loss=float(np.mean(losses)),
                               lr=opt.param_groups[0]["lr"], acc=acc))
        if acc[0] > best_acc and epoch:
            best_acc = float(acc[0])
            ref_best.append((epoch, acc[0]))
    # vacuity guards: the window opened, the coefficient moved, warmup
    # changed the LR between epochs
    assert applied_coeffs and min(applied_coeffs) < 0.9, applied_coeffs
    assert ref_epochs[0]["lr"] != ref_epochs[-1]["lr"]
    assert ref_best, "no best checkpoint was ever saved — vacuous run"

    # ---- our side: the production run_training(dgl=False) ----
    ours = []
    run_training(cfg, model, train_set, test_set, dgl=False,
                 raw_batches=False,
                 epoch_callback=lambda **kw: ours.append(kw))

    assert len(ours) == EPOCHS
    for e, (r, o) in enumerate(zip(ref_epochs, ours)):
        np.testing.assert_allclose(o["lr"], r["lr"], rtol=1e-12,
                                   err_msg=f"lr epoch {e}")
        tol = 3e-4 * 3.0 ** e
        np.testing.assert_allclose(float(o["means"]["loss_f"]), r["loss"],
                                   rtol=tol, atol=tol,
                                   err_msg=f"loss epoch {e}")
        assert o["acc"] == tuple(r["acc"]), (
            f"eval acc diverged at epoch {e}: {o['acc']} vs {r['acc']}")

    # ---- best-checkpoint selection ----
    pat = re.compile(r"epoch_(\d+)_acc_([0-9.]+)\.pth$")
    ours_saved = sorted(
        (int(m.group(1)), float(m.group(2)))
        for f in os.listdir(cfg.ckpt_path)
        for m in [pat.search(f)] if m)
    assert ours_saved == [(e, pytest.approx(a)) for e, a in ref_best], (
        f"best-ckpt selection diverged: {ours_saved} vs {ref_best}")

    # ---- final params + BN running stats ----
    final = ours[-1]["state"]
    got = flax_to_torch_state_dict(
        jax.device_get(final.params), jax.device_get(final.batch_stats),
        prefix="")
    want = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    worst_p = worst_rm = worst_rv = 0.0
    for k, v in got.items():
        if k.endswith("num_batches_tracked"):
            continue
        d = float(np.max(np.abs(v - want[k])))
        if k.endswith("running_mean"):
            worst_rm = max(worst_rm, d)
        elif k.endswith("running_var"):
            worst_rv = max(worst_rv, d / max(float(np.max(np.abs(want[k]))),
                                             1e-9))
        else:
            worst_p = max(worst_p, d)
    assert worst_p < 2e-2, f"param divergence {worst_p} after 4 epochs"
    assert worst_rm < 2e-3, f"BN running-mean divergence {worst_rm}"
    assert worst_rv < 2e-3, f"BN running-var rel divergence {worst_rv}"
    print(f"joint full-loop parity: param {worst_p:.2e}, "
          f"bn mean {worst_rm:.2e}, bn var rel {worst_rv:.2e}, "
          f"ogm coeffs {np.round(applied_coeffs, 3)}, "
          f"best epochs {[e for e, _ in ref_best]}")
