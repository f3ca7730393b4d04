"""Epoch-loop orchestration shared by the drivers (main_dgl.py / main.py).

Mirrors the reference driver flow (main_dgl.py:225-418): seed → model →
optimizer/schedule → loaders → epoch loop {train_epoch, valid, CSV row,
best-acc checkpoint} — with the TPU-native substitutions: a jit-compiled
train step over a device mesh instead of DataParallel, device metrics
fetched at logging cadence instead of per-step .item() syncs (the
reference's stall point, SURVEY §3.1), and optional exact resume.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import numpy as np

from gdl_tpu.config import Config
from gdl_tpu.data.loader import Loader
from gdl_tpu.data.preprocess import make_eval_preprocess, make_train_preprocess
from gdl_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    state_sharding,
)
from gdl_tpu.train.dgl import (
    TrainState,
    create_train_state,
    make_dgl_train_step,
    make_eval_step,
)
from gdl_tpu.train.joint import make_joint_eval_step, make_joint_train_step
from gdl_tpu.train.optim import lr_for_epoch, make_optimizer
from gdl_tpu.utils.checkpoint import (
    load_legacy_checkpoint,
    load_train_state,
    restore_params_into_state,
    save_legacy_checkpoint,
    save_train_state,
)
from gdl_tpu.utils.logging import CSVLogger, TBLogger
from gdl_tpu.utils.metrics import PerClassAccuracy
from gdl_tpu.utils.seed import setup_seed


@dataclass
class Harness:
    cfg: Config
    model: object
    mesh: object
    state: TrainState
    train_step: Callable
    eval_step: Callable
    batch_sh: object
    start_epoch: int = 0
    # resume-state sidecar (e.g. step_in_epoch for mid-epoch preemption
    # resume, utils/preempt.py); empty for fresh runs
    resume_extra: dict = field(default_factory=dict)


def build_harness(cfg: Config, model, steps_per_epoch: int,
                  dgl: bool = True, raw_batches: bool = True,
                  frames: Optional[int] = None,
                  mesh: Optional[jax.sharding.Mesh] = None) -> Harness:
    """`mesh` overrides the default flat make_mesh(dp, mp) — used for the
    hybrid (DCN x ICI) multi-slice dryrun, where the device array layout
    matters but the ('data', 'model') axis names are the same."""
    rng = setup_seed(cfg.random_seed)
    mesh = mesh if mesh is not None else make_mesh(cfg.dp, cfg.mp)
    dp = mesh.shape["data"]
    if cfg.batch_size % dp != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must divide the data-parallel "
            f"mesh size {dp} (set --dp or adjust --batch_size)")
    # the joint path clips explicitly inside its train step (pre-modulation,
    # the reference order) — its chain must not re-clip the modulated grads
    from gdl_tpu.train.optim import dead_fusion_param_mask

    optimizer = make_optimizer(cfg, steps_per_epoch,
                               clip_norm=40.0 if dgl else None,
                               wd_mask=dead_fusion_param_mask(cfg, dgl))
    state = create_train_state(model, cfg, rng, optimizer, frames=frames)
    if cfg.pretrained_path:
        from gdl_tpu.utils.torch_interop import load_pretrained_encoders

        state, _ = load_pretrained_encoders(state, cfg.pretrained_path)

    train_pre = make_train_preprocess(cfg) if raw_batches else None
    eval_pre = make_eval_preprocess(cfg) if raw_batches else None
    if dgl:
        train_step = make_dgl_train_step(model, cfg, optimizer,
                                         preprocess=train_pre, base_rng=rng)
        eval_step = make_eval_step(model, cfg, preprocess=eval_pre)
    else:
        train_step = make_joint_train_step(model, cfg, optimizer,
                                           steps_per_epoch,
                                           preprocess=train_pre,
                                           base_rng=rng)
        eval_step = make_joint_eval_step(model, cfg, preprocess=eval_pre)

    start_epoch = 0
    resume_extra = {}
    if cfg.resume:
        state, start_epoch, resume_extra = load_train_state(cfg.resume,
                                                            state)
        print("Resumed from {} at epoch {}".format(cfg.resume, start_epoch))

    state_sh = state_sharding(state, mesh)
    state = jax.device_put(state, state_sh)
    # eval outputs (per-example preds/labels) are replicated so the host
    # accounting can device_get them — required under multi-host, harmless
    # single-process (the all-gather moves a few ints)
    replicated = jax.sharding.NamedSharding(mesh,
                                            jax.sharding.PartitionSpec())
    return Harness(
        cfg=cfg, model=model, mesh=mesh, state=state,
        train_step=jax.jit(train_step, donate_argnums=(0,)),
        eval_step=jax.jit(eval_step, out_shardings=replicated),
        batch_sh=batch_sharding(mesh),
        start_epoch=start_epoch,
        resume_extra=resume_extra,
    )


def _put_batch(batch: dict, sharding) -> dict:
    """Host batch -> sharded global jax.Array.

    Single-process: plain async device_put. Multi-host: each process holds
    only its batch shard (Loader process striding); assemble the global
    array from the per-process local data — rows land on the process's own
    addressable devices, so no cross-host data movement happens here."""
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def _device_prefetch(iterator, sharding, depth: int = 2):
    """Keep `depth` batches in flight on the device while the current step
    runs — overlaps host→device transfer with compute (device_put is
    async; holding references keeps the copies in flight)."""
    import collections

    queue = collections.deque()
    for batch in iterator:
        queue.append(_put_batch(batch, sharding))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def train_one_epoch(h: Harness, loader: Loader, epoch: int,
                    grad_csv: Optional[CSVLogger] = None,
                    log_every: int = 100, guard=None,
                    init_sums: Optional[dict] = None,
                    init_count: int = 0) -> dict:
    """Returns the 7 epoch-mean scalars of the reference train_epoch
    (main_dgl.py:164-165 / main.py:356-357). `guard` is an optional
    utils/preempt.PreemptionGuard checked once per step; when it fires,
    the epoch stops at the step boundary and the returned means carry
    preempted=True with `steps` counting only the completed steps (plus
    `_sums`, the running per-metric sums, so the resumed run can finish
    the epoch with UNBIASED full-epoch means). `init_sums`/`init_count`
    re-seed those accumulators on a mid-epoch resume (ADVICE r4: without
    them a resumed epoch's TB losses averaged only the tail steps)."""
    cfg = h.cfg
    if epoch < 20:
        print(epoch, lr_for_epoch(cfg, epoch))
    print("Start training ... ")
    sums = dict(init_sums) if init_sums else {}
    count = 0
    pending = []  # step metrics, drained in chunks — keeps the hot loop
    # free of device→host syncs (the reference's per-step .item() probes
    # stall every step, SURVEY §3.1) without holding an epoch of buffers
    t0 = time.time()
    from gdl_tpu.utils.profiling import step_trace

    def drain():
        for metrics in pending:
            m = jax.device_get(metrics)
            if grad_csv is not None and "audio_grad_sum" in m:
                grad_csv.write_row([float(m["audio_grad_sum"]),
                                    float(m["visual_grad_sum"])])
            for k, v in m.items():
                if np.ndim(v) == 0:
                    sums[k] = sums.get(k, 0.0) + float(v)
        pending.clear()

    profile_dir = cfg.profile_dir if epoch == 0 else None
    preempted = False
    for step, batch in enumerate(_device_prefetch(loader, h.batch_sh)):
        with step_trace(profile_dir, step):
            h.state, metrics = h.train_step(h.state, batch)
        pending.append(metrics)
        if len(pending) >= 512:
            drain()
        if step % log_every == 0:
            m = jax.device_get(metrics)
            print("unimodal_loss:", float(m["loss_a"] + m["loss_v"]),
                  "cls_loss:", float(m["loss_f"]))
            if "audio_grad_sum" in m:
                print("grad:", float(m["audio_grad_sum"]),
                      float(m["visual_grad_sum"]))
                print("unimodal", float(m["abs_out_a"]),
                      float(m["abs_out_v"]))
        count += 1
        if guard is not None and guard.should_stop(count):
            preempted = True
            break
    drain()
    if grad_csv is not None:
        grad_csv.flush()
    total = init_count + count
    means = {k: v / max(total, 1) for k, v in sums.items()}
    means["steps"] = count  # steps THIS run (resume bookkeeping)
    means["wall_time"] = time.time() - t0
    means["preempted"] = preempted
    if preempted:  # carried into the resume state; never reaches TB
        means["_sums"] = {k: float(v) for k, v in sums.items()}
    return means


def _pad_batch(batch: dict, target: int):
    """Edge-pad a ragged final batch to `target` rows (keeps jit shapes
    static and the 'data' sharding divisible); returns (batch, n_valid)."""
    n = len(batch["label"])
    if n == target:
        return batch, n
    pad = target - n
    padded = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
              for k, v in batch.items()}
    return padded, n


def evaluate(h: Harness, loader: Loader) -> tuple:
    """(acc, acc_a, acc_v) with the reference's per-class accounting.

    Ragged final batches (eval_drop_last=False) are edge-padded to the full
    batch size and the padding excluded from the counts — no recompiles, no
    sharding-divisibility failures, untruncated accuracy."""
    counters = PerClassAccuracy(h.cfg.n_classes)

    def padded():
        target = loader.local_batch  # == batch_size single-process
        for batch in loader:
            batch, n = _pad_batch(batch, target)
            yield _put_batch(batch, h.batch_sh), n

    import collections

    inflight = collections.deque()
    def consume():
        batch_dev, n = inflight.popleft()
        out = jax.device_get(h.eval_step(h.state, batch_dev))
        if jax.process_count() > 1:
            # outputs are replicated GLOBAL rows; padding is impossible
            # (sharded loading requires drop_last) — count them all, so
            # every host reports the identical accuracy
            n = out["pred"].shape[0]
        counters.update(out["pred"][:n], out["pred_a"][:n],
                        out["pred_v"][:n], out["label"][:n])

    for item in padded():
        inflight.append(item)
        if len(inflight) >= 2:
            consume()
    while inflight:
        consume()
    return counters.results()


def run_training(cfg: Config, model, train_set, test_set,
                 dgl: bool = True, raw_batches: bool = True,
                 epoch_callback=None, preempt_guard=None) -> float:
    """Full --train flow (main_dgl.py:296-396). Returns best accuracy.

    Multi-host aware: each host decodes only its batch shard, and file
    artifacts (CSVs, TensorBoard, checkpoints) are written by process 0
    only — every host computes the identical replicated metrics.

    raw_batches=False consumes pre-tensorized {'audio','visual','label'}
    batches with no in-step preprocessing (full-loop parity tests feed
    both this and the torch reference loop the identical tensors).
    epoch_callback(epoch=..., means=..., acc=..., lr=..., state=...) is
    invoked after each epoch's train+eval — an observation hook for
    tests and external monitors.

    Preemption (cfg.preempt_save, default on): SIGTERM stops training at
    the next step boundary and writes `resume_state.msgpack` carrying the
    epoch AND step-in-epoch; `--resume` then replays the remainder of the
    interrupted epoch exactly (utils/preempt.py — bitwise equivalence
    proven by tests/test_preempt.py). `preempt_guard` injects a
    pre-configured guard (tests, external schedulers)."""
    pc, pi = jax.process_count(), jax.process_index()
    primary = pi == 0
    if pc > 1 and not cfg.eval_drop_last:
        raise ValueError("multi-host training requires --eval_drop_last 1 "
                         "(sharded eval batches must partition evenly)")
    train_loader = Loader(train_set, cfg.batch_size, shuffle=True,
                          drop_last=True, num_workers=cfg.num_workers,
                          seed=cfg.random_seed,
                          process_index=pi, process_count=pc)
    test_loader = Loader(test_set, cfg.batch_size, shuffle=False,
                         drop_last=cfg.eval_drop_last,
                         num_workers=cfg.num_workers, seed=cfg.random_seed,
                         process_index=pi, process_count=pc)
    steps_per_epoch = max(len(train_loader), 1)
    h = build_harness(cfg, model, steps_per_epoch, dgl=dgl,
                      raw_batches=raw_batches)

    os.makedirs(cfg.ckpt_path, exist_ok=True)
    acc_csv = None
    if primary:
        acc_csv = CSVLogger(
            os.path.join(cfg.ckpt_path,
                         "{}_{}.csv".format(cfg.dataset, cfg.modality)),
            sentinel=[1000, 1000, 1000])
    grad_csv = None
    if primary and dgl and cfg.log_grad_csv and cfg.modality == "full":
        grad_csv = CSVLogger("audio_visual_grad_vanilla.csv",
                             flush_every=256)
    tb = None
    if primary and cfg.use_tensorboard and cfg.tensorboard_path:
        tb = TBLogger(cfg.tensorboard_path, cfg.dataset, cfg.fusion_method,
                      cfg.modulation)

    guard = preempt_guard
    owned_guard = False
    if guard is None and cfg.preempt_save:
        from gdl_tpu.utils.preempt import PreemptionGuard

        guard = PreemptionGuard(
            sync_every=getattr(cfg, "preempt_sync_every", 32)).install()
        owned_guard = True
    # mid-epoch resume: re-enter the interrupted epoch past the batches
    # already trained (the saved global step already reflects them)
    pending_skip = int(h.resume_extra.get("step_in_epoch", 0) or 0)
    pending_sums = h.resume_extra.get("partial_sums") or None
    resume_path = os.path.join(cfg.ckpt_path, "resume_state.msgpack")

    best_acc = 0.0
    try:
        best_acc = _epoch_loop(
            h, cfg, train_loader, test_loader, steps_per_epoch, guard,
            grad_csv, acc_csv, tb, primary, epoch_callback,
            pending_skip, pending_sums, resume_path)
    finally:
        # a raise inside train/eval must not leak the SIGTERM handler
        # (a later signal would set a dead guard's flag instead of
        # terminating the process — ADVICE r4) nor leave CSVs unflushed
        if owned_guard:
            guard.uninstall()
        if grad_csv is not None:
            grad_csv.close()
        if acc_csv is not None:
            acc_csv.close()
        if tb is not None:
            tb.close()
    return best_acc


def _epoch_loop(h: Harness, cfg: Config, train_loader, test_loader,
                steps_per_epoch: int, guard, grad_csv, acc_csv, tb,
                primary: bool, epoch_callback,
                pending_skip: int, pending_sums, resume_path: str) -> float:
    best_acc = 0.0
    for epoch in range(h.start_epoch, cfg.epochs):
        print("Epoch: {}: ".format(epoch))
        # resumed runs must replay epoch `epoch`'s shuffle order and
        # augmentation draws, not restart the loader's counter at 0
        train_loader.set_epoch(epoch)
        skip, pending_skip = pending_skip, 0
        init_sums, pending_sums = pending_sums, None
        if skip:
            train_loader.skip_next_batches(skip)
        # init_count only when the partial sums were actually restored: a
        # resume state without them (older writer, empty dict) must fall
        # back to the tail average, not divide tail sums by the full count
        means = train_one_epoch(h, train_loader, epoch, grad_csv=grad_csv,
                                guard=guard, init_sums=init_sums,
                                init_count=skip if init_sums else 0)
        # a flag raised inside the final partial sync_every window would
        # otherwise defer the stop past a full eval + next epoch (ADVICE
        # r4) — agree() is a local Event read single-process
        if (not means.get("preempted") and guard is not None
                and guard.agree()):
            means["preempted"] = True
            means.setdefault("_sums", {})
        stop_after_epilogue = False
        if means.get("preempted"):
            steps_done = skip + int(means["steps"])
            if steps_done < steps_per_epoch:
                # mid-epoch: save and stop BEFORE eval (the uninterrupted
                # run only evals at epoch end; the resumed run finishes
                # this epoch and evals then)
                extra = {"step_in_epoch": steps_done,
                         "partial_sums": means.get("_sums", {})}
                if primary:
                    save_train_state(resume_path, h.state, epoch,
                                     extra=extra)
                print("Preempted at epoch {} step {}; resume state saved "
                      "to {} (--resume to continue)".format(
                          epoch, steps_done, resume_path))
                break
            # fired on the final step: the epoch's training is COMPLETE.
            # Save the resume state NOW (durable within the scheduler's
            # grace window even if the kill lands mid-eval), then run the
            # normal eval/CSV/best-checkpoint epilogue — the resumed run
            # starts at epoch+1 and would otherwise never eval this epoch
            # (no accuracy row, best ckpt possibly never saved)
            if primary:
                save_train_state(resume_path, h.state, epoch + 1,
                                 extra={"step_in_epoch": 0})
            stop_after_epilogue = True
        acc, acc_a, acc_v = evaluate(h, test_loader)
        if epoch_callback is not None:
            epoch_callback(epoch=epoch, means=means,
                           acc=(acc, acc_a, acc_v),
                           lr=lr_for_epoch(cfg, epoch), state=h.state)
        if acc_csv is not None:
            acc_csv.write_row([acc, acc_a, acc_v])
            acc_csv.flush()
        if tb is not None:
            tb.log_epoch(epoch,
                         {"Total Loss": means.get("loss", means.get("loss_f", 0.0)),
                          "Audio Loss": means.get("loss_a", 0.0),
                          "Visual Loss": means.get("loss_v", 0.0)},
                         {"Total Accuracy": acc, "Audio Accuracy": acc_a,
                          "Visual Accuracy": acc_v})

        if acc > best_acc and epoch:  # epoch>0 guard (main_dgl.py:349)
            best_acc = float(acc)
            if primary:
                if cfg.save_torch:
                    from gdl_tpu.utils.torch_interop import (
                        save_torch_checkpoint,
                    )

                    path = save_torch_checkpoint(cfg, h.state, epoch, acc)
                else:
                    path = save_legacy_checkpoint(cfg, h.state, epoch, acc)
                print("The best model has been saved at {}.".format(path))
            print("Loss: {:.3f}, Acc: {:.3f}".format(
                means.get("loss_f", 0.0), acc))
            print("Audio Acc: {:.3f}, Visual Acc: {:.3f} ".format(acc_a,
                                                                  acc_v))
        else:
            print("Loss: {:.3f}, Acc: {:.3f}, Best Acc: {:.3f}".format(
                means.get("loss_f", 0.0), acc, best_acc))
            print("Audio Acc: {:.3f}, Visual Acc: {:.3f} ".format(acc_a,
                                                                  acc_v))
        if primary and cfg.save_every and (epoch + 1) % cfg.save_every == 0:
            # epoch-boundary state (also keeps the explicit step_in_epoch=0
            # written by an epoch-complete preemption above from being
            # clobbered by this re-save)
            save_train_state(resume_path, h.state, epoch + 1,
                             extra={"step_in_epoch": 0})
        if stop_after_epilogue:
            print("Preempted at epoch {} step {} (epoch complete, eval "
                  "done); resume state saved to {} (--resume to "
                  "continue)".format(epoch, steps_per_epoch, resume_path))
            break
    return best_acc


def run_eval(cfg: Config, model, test_set, ckpt_path: str,
             dgl: bool = True) -> tuple:
    """Eval mode (main_dgl.py:398-418 / valid.py): load + validate."""
    test_loader = Loader(test_set, cfg.batch_size, shuffle=False,
                         drop_last=cfg.eval_drop_last,
                         num_workers=cfg.num_workers, seed=cfg.random_seed,
                         process_index=jax.process_index(),
                         process_count=jax.process_count())
    h = build_harness(cfg, model, max(len(test_loader), 1), dgl=dgl)
    from gdl_tpu.utils.torch_interop import (
        is_torch_checkpoint,
        load_torch_checkpoint,
        restore_torch_into_state,
    )

    if is_torch_checkpoint(ckpt_path):
        # a REAL reference torch .pth (valid.py:148 strict=False semantics)
        loaded = load_torch_checkpoint(ckpt_path, cfg)
        h.state = restore_torch_into_state(h.state, loaded)
    else:
        loaded = load_legacy_checkpoint(ckpt_path, cfg)
        h.state = restore_params_into_state(h.state, loaded)
    print("Trained model loaded!")
    acc, acc_a, acc_v = evaluate(h, test_loader)
    print("Accuracy: {}, accuracy_a: {}, accuracy_v: {}".format(
        acc, acc_a, acc_v))
    return acc, acc_a, acc_v
