"""Torch `.pth` state-dict interop — the bridge to the reference's artifact
of record.

The reference saves `model.state_dict()` of a DataParallel-wrapped torch
module (main_dgl.py:349-386: keys like `module.audio_net.layer1.0.conv1.
weight`) and evaluates with `load_state_dict(torch.load(p)['model'],
strict=False)` (valid.py:148). This module converts both ways between that
format and our flax param/batch-stats trees, so

  - a REAL reference checkpoint evaluates under our `valid.py`, and
  - our training runs export checkpoints the reference's valid.py loads.

Layout translation (torchvision/torch conventions <-> flax):
  - conv kernel  [O, I, kH, kW]  <->  [kH, kW, I, O]
  - linear weight [O, I]         <->  kernel [I, O]
  - BN weight/bias/running_mean/running_var
       <->  params scale/bias + batch_stats mean/var
  - module paths: `layerS.B` <-> `layerS_B`, `downsample.{0,1}` <->
    `downsample_{conv,bn}` (our flat flax naming)
  - the `module.` DataParallel prefix is stripped on import, added on
    export.

The translation is template-driven: the flax tree supplies structure and
shapes, so it covers every model whose module names mirror the reference
(AVClassifier_DGL with all fusion heads, the unimodal classifier variants,
PE heads). strict=False import (valid.py:148 semantics) keeps the current
value for any missing key.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np


def _torch_components(path: List[str]) -> List[str]:
    """Flax module-path components -> torch dotted-name components.

    Covers the ResNet family (torchvision naming) and the Swin family
    (Microsoft swin_transformer naming: layers.S.blocks.B...,
    layers.S.downsample, mlp.fc1/fc2)."""
    out: List[str] = []
    for comp in path:
        m = re.fullmatch(r"(layer\d+)_(\d+)", comp)
        if m:
            out += [m.group(1), m.group(2)]
            continue
        m = re.fullmatch(r"stage(\d+)_block(\d+)", comp)
        if m:
            out += ["layers", m.group(1), "blocks", m.group(2)]
            continue
        m = re.fullmatch(r"merge(\d+)", comp)
        if m:
            out += ["layers", m.group(1), "downsample"]
            continue
        if comp == "downsample_conv":
            out += ["downsample", "0"]
        elif comp == "downsample_bn":
            out += ["downsample", "1"]
        elif comp == "mlp_fc1":
            out += ["mlp", "fc1"]
        elif comp == "mlp_fc2":
            out += ["mlp", "fc2"]
        else:
            out.append(comp)
    return out


def _flat_with_path(tree, prefix=()) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    out = []
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k in sorted(tree.keys()):
            out += _flat_with_path(tree[k], prefix + (str(k),))
    else:
        out.append((prefix, tree))
    return out


def _param_leaf_to_torch(leaf_name: str, arr: np.ndarray):
    """(torch_leaf_name, torch_layout_array) for a flax PARAM leaf."""
    if leaf_name == "kernel":
        if arr.ndim == 4:  # conv [kH,kW,I,O] -> [O,I,kH,kW]
            return "weight", np.transpose(arr, (3, 2, 0, 1))
        if arr.ndim == 2:  # dense [I,O] -> [O,I]
            return "weight", np.transpose(arr, (1, 0))
        return "weight", arr
    if leaf_name == "scale":
        return "weight", arr
    if leaf_name == "bias":
        return "bias", arr
    if leaf_name == "embedding":
        return "weight", arr
    return leaf_name, arr


def _torch_to_param_leaf(leaf_name: str, template: np.ndarray,
                         arr: np.ndarray) -> np.ndarray:
    """Inverse of _param_leaf_to_torch, shape-checked against template."""
    if leaf_name == "kernel":
        if template.ndim == 4:
            arr = np.transpose(arr, (2, 3, 1, 0))
        elif template.ndim == 2:
            arr = np.transpose(arr, (1, 0))
    if arr.shape != tuple(template.shape):
        raise ValueError(
            f"shape mismatch for {leaf_name}: checkpoint {arr.shape} vs "
            f"model {tuple(template.shape)}")
    return np.asarray(arr, dtype=np.asarray(template).dtype)


_STATS_TO_TORCH = {"mean": "running_mean", "var": "running_var"}


def flax_to_torch_state_dict(params, batch_stats,
                             prefix: str = "module.") -> Dict[str, np.ndarray]:
    """Flax trees -> a torch-layout state dict (numpy values; wrap with
    torch.from_numpy to torch.save). Emits num_batches_tracked=0 for every
    BN so torch strict loads succeed."""
    sd: Dict[str, np.ndarray] = {}
    for path, arr in _flat_with_path(params):
        comps = _torch_components(list(path[:-1]))
        tname, tarr = _param_leaf_to_torch(path[-1], np.asarray(arr))
        sd[prefix + ".".join(comps + [tname])] = np.ascontiguousarray(tarr)
    for path, arr in _flat_with_path(batch_stats):
        comps = _torch_components(list(path[:-1]))
        tname = _STATS_TO_TORCH.get(path[-1], path[-1])
        key = prefix + ".".join(comps + [tname])
        sd[key] = np.ascontiguousarray(np.asarray(arr))
        if tname == "running_var":
            sd[prefix + ".".join(comps + ["num_batches_tracked"])] = (
                np.asarray(0, np.int64))
    return sd


def _strip_module_prefix(sd: dict) -> dict:
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def torch_state_dict_to_flax(sd: dict, params, batch_stats,
                             strict: bool = False,
                             skip_mismatch: bool = False):
    """Torch state dict -> (params, batch_stats) shaped like the given
    templates. strict=False (valid.py:148 semantics): keys missing from the
    checkpoint keep the template's current value. skip_mismatch=True keeps
    the template on SHAPE mismatches too (the reference's ImageNet
    partial-load filter, resnet18_se.py:228-248) instead of raising."""
    sd = _strip_module_prefix(sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    used = set()
    missing: List[str] = []
    mismatched: List[str] = []

    def rebuild(tree, prefix, is_stats):
        if isinstance(tree, dict) or hasattr(tree, "items"):
            out = {k: rebuild(tree[k], prefix + (str(k),), is_stats)
                   for k in tree.keys()}
            return type(tree)(out) if not isinstance(tree, dict) else out
        comps = _torch_components(list(prefix[:-1]))
        leaf = prefix[-1]
        if is_stats:
            tname = _STATS_TO_TORCH.get(leaf, leaf)
            key = ".".join(comps + [tname])
            if key not in sd:
                missing.append(key)
                return tree
            used.add(key)
            arr = sd[key]
            if arr.shape != tuple(np.shape(tree)):
                if skip_mismatch:
                    mismatched.append(key)
                    return tree
                raise ValueError(f"shape mismatch for {key}: "
                                 f"{arr.shape} vs {np.shape(tree)}")
            return np.asarray(arr, dtype=np.asarray(tree).dtype)
        tname, _ = _param_leaf_to_torch(leaf, np.asarray(tree))
        key = ".".join(comps + [tname])
        if key not in sd:
            missing.append(key)
            return tree
        used.add(key)
        try:
            return _torch_to_param_leaf(leaf, np.asarray(tree), sd[key])
        except ValueError:
            if skip_mismatch:
                mismatched.append(key)
                return tree
            raise

    new_params = rebuild(params, (), is_stats=False)
    new_stats = rebuild(batch_stats, (), is_stats=True)
    unexpected = [k for k in sd
                  if k not in used and not k.endswith("num_batches_tracked")]
    if strict and (missing or unexpected):
        raise KeyError(f"missing keys: {missing[:10]}... "
                       f"unexpected keys: {unexpected[:10]}...")
    return new_params, new_stats, {"missing": missing,
                                   "unexpected": unexpected,
                                   "mismatched": mismatched}


# ---------------------------------------------------------------------------
# checkpoint-file level
# ---------------------------------------------------------------------------


def is_torch_checkpoint(path: str) -> bool:
    """torch>=1.6 saves a zipfile (PK..); legacy torch is a pickle stream
    (0x80 <proto>). Our msgpack files start with a fixmap of >=6 entries
    (0x86+), so the magics are disjoint in practice."""
    with open(path, "rb") as f:
        head = f.read(2)
    if head[:2] == b"PK":
        return True
    return len(head) == 2 and head[0] == 0x80 and 2 <= head[1] <= 5


def load_torch_checkpoint(path: str, cfg=None) -> dict:
    """torch.load + the reference's compatibility asserts
    (main_dgl.py:409-410). Returns {'model': <state_dict>, ...metadata}.
    Accepts both the reference's saved dict ({'model': sd, 'modulation',
    ...}) and a bare state dict."""
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(loaded, dict):
        raise ValueError(f"unsupported torch checkpoint object: "
                         f"{type(loaded)}")
    if "model" not in loaded:  # bare state dict
        loaded = {"model": loaded}
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in loaded["model"].items()}
    out = {k: v for k, v in loaded.items() if k != "model"}
    out["model"] = sd
    if cfg is not None and "modulation" in out:
        assert out["modulation"] == cfg.modulation, (
            "inconsistency between modulation method of loaded model and "
            "args !")
        assert out["fusion"] == cfg.fusion_method, (
            "inconsistency between fusion method of loaded model and args !")
    return out


def save_torch_checkpoint(cfg, state, epoch: int, acc: float,
                          path: Optional[str] = None) -> str:
    """Export the reference's exact checkpoint schema as a REAL torch .pth
    (main_dgl.py:349-386) — loadable by the reference's valid.py. The
    optimizer entry carries the hyperparameters only (param_groups); optax
    momentum traces have no stable torch index mapping."""
    import os

    import torch

    from gdl_tpu.utils.checkpoint import legacy_checkpoint_name

    sd = flax_to_torch_state_dict(state.params, state.batch_stats)
    saved = {
        "saved_epoch": epoch,
        "modulation": cfg.modulation,
        "alpha": cfg.alpha,
        "fusion": cfg.fusion_method,
        "acc": acc,
        "model": {k: torch.from_numpy(np.array(v, copy=True))
                  for k, v in sd.items()},
        "optimizer": {
            "state": {},
            "param_groups": [{
                "lr": cfg.learning_rate, "momentum": 0.9,
                "weight_decay": 1e-4, "params": [],
            }],
        },
        "scheduler": {
            "milestones": list(cfg.lr_decay_step),
            "gamma": cfg.lr_decay_ratio,
        },
    }
    if path is None:
        os.makedirs(cfg.ckpt_path, exist_ok=True)
        path = os.path.join(cfg.ckpt_path,
                            legacy_checkpoint_name(cfg, epoch, acc))
    torch.save(saved, path)
    return path


def load_pretrained_encoders(state, path: str, targets=None):
    """Partial-load a torchvision-format backbone state dict (a LOCAL
    file; e.g. torchvision's resnet18 ImageNet weights saved with
    torch.save(model.state_dict(), ...)) into each target encoder subtree.

    Reference behavior being replaced: models/resnet18_se.py:228-248
    filters the pretrained dict to keys present in the model with matching
    shapes and load_state_dict's the rest — here per-encoder with
    skip_mismatch (e.g. the audio stem conv1 is 1-channel vs torchvision's
    3-channel and is skipped, exactly like the reference's filter drops
    it). Returns (new_state, report_per_target)."""
    import torch

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(loaded, dict) and "model" in loaded and isinstance(
            loaded["model"], dict):
        loaded = loaded["model"]
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in loaded.items() if hasattr(v, "shape")}
    sd = _strip_module_prefix(sd)

    params = {k: v for k, v in state.params.items()}
    stats = {k: v for k, v in state.batch_stats.items()}
    if targets is None:
        # any top-level subtree that starts with a conv stem (ResNet/SE
        # family) or a patch embed (Swin) is an encoder
        targets = [k for k, v in params.items()
                   if hasattr(v, "keys")
                   and ("conv1" in v or "patch_embed" in v)]
    reports = {}
    for t in targets:
        if t not in params:
            continue
        new_p, new_s, rep = torch_state_dict_to_flax(
            sd, params[t], stats.get(t, {}), strict=False,
            skip_mismatch=True)
        params[t] = new_p
        if t in stats:
            stats[t] = new_s
        total = (sum(1 for _ in _flat_with_path(new_p))
                 + sum(1 for _ in _flat_with_path(stats.get(t, {}))))
        loaded_n = total - len(rep["missing"]) - len(rep["mismatched"])
        print(f"pretrained[{t}]: loaded={loaded_n} "
              f"missing={len(rep['missing'])} "
              f"shape-skipped={len(rep['mismatched'])}")
        reports[t] = rep
    ptype = type(state.params)
    stype = type(state.batch_stats)
    return state.replace(
        params=ptype(params) if not isinstance(state.params, dict)
        else params,
        batch_stats=stype(stats) if not isinstance(state.batch_stats, dict)
        else stats), reports


def restore_torch_into_state(state, loaded: dict, strict: bool = False):
    """Adopt a torch checkpoint's arrays into a TrainState (strict=False
    mirrors valid.py:148)."""
    params, stats, report = torch_state_dict_to_flax(
        loaded["model"], state.params, state.batch_stats, strict=strict)
    if report["missing"]:
        print(f"torch import: {len(report['missing'])} keys missing "
              f"(kept current values)")
    if report["unexpected"]:
        print(f"torch import: {len(report['unexpected'])} checkpoint keys "
              f"unused")
    return state.replace(params=params, batch_stats=stats)
