"""Checkpointing: reference-schema best checkpoints + real training resume.

Legacy parity (SURVEY §3.6): on a new best accuracy the reference saves a
dict {saved_epoch, modulation, alpha, fusion, acc, model, optimizer,
scheduler?} under the filename pattern
  best_model_of_dataset_{ds}_{mod}_alpha_{a}optimizer_{opt}_modulate_
  starts_{s}_ends_{e}_epoch_{n}_acc_{acc}.pth
(main_dgl.py:349-386) and on load asserts modulation/fusion consistency
(main_dgl.py:409-410). Reproduced here with flax msgpack serialization in
place of torch pickles (same logical keys, .pth kept for the name pattern).

New capability the reference lacks (SURVEY §5.3/5.4: no mid-run resume):
`save_train_state`/`load_train_state` persist the FULL TrainState
(params + BN stats + optimizer state + step) for exact resume.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from gdl_tpu.config import Config
from gdl_tpu.train.dgl import TrainState


def legacy_checkpoint_name(cfg: Config, epoch: int, acc: float) -> str:
    return (
        "best_model_of_dataset_{}_{}_alpha_{}"
        "optimizer_{}_modulate_starts_{}_ends_{}_"
        "epoch_{}_acc_{}.pth".format(
            cfg.dataset, cfg.modulation, cfg.alpha, cfg.optimizer,
            cfg.modulation_starts, cfg.modulation_ends, epoch, acc)
    )


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_legacy_checkpoint(cfg: Config, state: TrainState, epoch: int,
                           acc: float,
                           include_scheduler: bool = True) -> str:
    """Write the best-accuracy checkpoint; returns its full path."""
    os.makedirs(cfg.ckpt_path, exist_ok=True)
    saved = {
        "saved_epoch": epoch,
        "modulation": cfg.modulation,
        "alpha": cfg.alpha,
        "fusion": cfg.fusion_method,
        "acc": acc,
        "model": {
            "params": serialization.to_state_dict(_to_host(state.params)),
            "batch_stats": serialization.to_state_dict(
                _to_host(state.batch_stats)),
        },
        "optimizer": serialization.to_state_dict(_to_host(state.opt_state)),
    }
    if include_scheduler:
        # the schedule is stateless here (pure function of step); persist
        # the knobs so eval-side asserts & inspection have them
        saved["scheduler"] = {
            "lr_decay_step": list(cfg.lr_decay_step),
            "lr_decay_ratio": cfg.lr_decay_ratio,
            "learning_rate": cfg.learning_rate,
        }
    path = os.path.join(cfg.ckpt_path, legacy_checkpoint_name(cfg, epoch, acc))
    blob = serialization.msgpack_serialize(saved)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_legacy_checkpoint(path: str, cfg: Optional[Config] = None) -> dict:
    """Load + the reference's compatibility asserts (main_dgl.py:409-410)."""
    with open(path, "rb") as f:
        loaded = serialization.msgpack_restore(f.read())
    if cfg is not None:
        assert loaded["modulation"] == cfg.modulation, (
            "inconsistency between modulation method of loaded model and "
            "args !")
        assert loaded["fusion"] == cfg.fusion_method, (
            "inconsistency between fusion method of loaded model and args !")
    return loaded


def restore_params_into_state(state: TrainState, loaded: dict) -> TrainState:
    """strict=False-style restore (valid.py:148): adopt the loaded model
    arrays, keep current optimizer state."""
    model = loaded["model"]

    def _cast_like(tgt, src):
        return jax.tree.map(
            lambda t, s: np.asarray(s).astype(t.dtype).reshape(t.shape),
            tgt, src)

    return state.replace(params=_cast_like(state.params, model["params"]),
                         batch_stats=_cast_like(state.batch_stats,
                                                model["batch_stats"]))


def save_train_state(path: str, state: TrainState, epoch: int,
                     extra: Optional[dict] = None) -> None:
    """Atomic: written to a sibling tmp file then os.replace'd, so a crash
    (or the tail of a preemption grace window, utils/preempt.py) mid-write
    never corrupts an existing resume state."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "state": serialization.to_state_dict(_to_host(state)),
        "epoch": epoch,
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
        # durability before the rename: without fsync a HOST crash (not
        # just a process crash) can publish a truncated tmp over the good
        # resume state on some filesystems (ADVICE r4)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    try:  # persist the rename itself (directory entry)
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # not supported on some platforms; the file fsync stands


def load_train_state(path: str, state: TrainState) -> Tuple[TrainState, int,
                                                            dict]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    restored = serialization.from_state_dict(state, payload["state"])
    return restored, int(payload["epoch"]), payload.get("extra", {})


# ---------------------------------------------------------------------------
# Orbax backend — async, sharding-aware checkpointing for large-scale runs
# (multi-host safe; each host writes its shards). The msgpack paths above
# stay the default for the single-host reference-parity flows.
# ---------------------------------------------------------------------------


class OrbaxCheckpointManager:
    """Thin orbax CheckpointManager wrapper over TrainState + epoch."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, epoch: int, state: TrainState,
             wait: bool = False) -> None:
        self.manager.save(epoch, args=self._ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def restore(self, state: TrainState,
                epoch: Optional[int] = None) -> Tuple[TrainState, int]:
        step = epoch if epoch is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError("no orbax checkpoint found")
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(state))
        return restored, int(step)

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
