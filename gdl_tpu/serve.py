"""AOT serving export: serialize a trained eval function to a portable
artifact via `jax.export` (StableHLO bytes, weights baked in as constants).

The reference has no serving story — its `valid.py` re-runs the Python
model per evaluation (/root/reference/valid.py:123-178). The TPU-native
production path is ahead-of-time: lower the jitted eval step once for the
target platform(s), serialize it, and replay it anywhere with
`load_exported(path).call(audio, visual)` — no model code, no Flax, no
checkpoint loading at serving time. Pallas window-attention kernels ride
along as custom calls when lowered for TPU; CPU lowerings take the XLA
attention path automatically (gdl_tpu/models/swin.py backend gate).

    # train, then:
    python valid.py --ckpt_path ckpt.pth --export_path model.hlo ...
    # serve:
    from gdl_tpu.serve import load_exported
    logits, logits_a, logits_v = load_exported("model.hlo").call(a, v)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_eval(model, variables: dict, example_inputs: Sequence[Any],
                platforms: Optional[Sequence[str]] = None,
                apply_kwargs: Optional[dict] = None,
                poly_batch: bool = False):
    """Export `model.apply(variables, *inputs, train=False)` with the
    weights closed over as constants. Returns a jax.export.Exported.

    platforms: lowering targets, e.g. ("tpu",) or ("tpu", "cpu");
    None = the current default backend. apply_kwargs: extra static
    keyword arguments for apply (e.g. av_inputs=True for the
    intermediate family's AV adapter).

    poly_batch: export with a SYMBOLIC leading batch dimension shared by
    every input (jax.export shape polymorphism) — one artifact then
    serves ANY batch size, where the default fixed-shape artifact pins
    the example batch. Eval-only model code is batch-polymorphic
    throughout (BN normalizes with running stats; pools/reshapes derive
    from input shapes), but the Pallas eval kernels are not (Mosaic
    grids are static-shape), so callers force the XLA eval path when
    poly_batch is set — see export_from_checkpoint. Fixed-shape exports
    remain the TPU production default: XLA compiles (and the serving
    fleet pads to) one blessed batch size per artifact anyway, and the
    fixed path keeps the fused eval kernels.
    """
    extra = dict(apply_kwargs or {})

    def serve_fn(*inputs):
        return model.apply(variables, *inputs, train=False, **extra)

    if poly_batch:
        (b,) = jax_export.symbolic_shape("b")
        specs = tuple(
            jax.ShapeDtypeStruct((b,) + tuple(jnp.shape(x))[1:],
                                 jnp.asarray(x).dtype)
            for x in example_inputs)
    else:
        specs = tuple(jax.ShapeDtypeStruct(jnp.shape(x),
                                           jnp.asarray(x).dtype)
                      for x in example_inputs)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(serve_fn), **kw)(*specs)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    """Deserialize an artifact written by save_exported. Use `.call(...)`."""
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


def export_from_checkpoint(cfg, ckpt_path: str, out_path: str,
                           batch_size: Optional[int] = None,
                           platforms: Sequence[str] = ("cpu", "tpu"),
                           dgl: bool = True,
                           poly_batch: bool = False):
    """Build the classifier for `cfg` (DGL family by default; dgl=False
    selects the joint main.py family), load a checkpoint (ours or a
    reference torch .pth), and write the serving artifact. The exported
    callable takes (audio [B,F,T,1] f32, visual [B,T,H,W,3] f32) shaped
    by the dataset config and returns the model's eval outputs (the
    (out, out_a, out_v) logits for DGL; the 11-tuple for joint). By
    default the artifact is lowered for BOTH cpu and tpu, so one file
    serves on either platform. poly_batch=True exports a symbolic batch
    dimension instead of pinning `batch_size` (see export_eval) — the
    Pallas eval kernels are forced off for such artifacts (static-shape
    Mosaic grids)."""
    from gdl_tpu.models.classifier import (
        AVClassifier,
        AVClassifierDGL,
        AVClassifierSwin,
        AVClassifierSwinDGL,
    )
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.optim import make_optimizer
    from gdl_tpu.utils.checkpoint import (
        load_legacy_checkpoint,
        restore_params_into_state,
    )
    from gdl_tpu.utils.torch_interop import (
        is_torch_checkpoint,
        load_torch_checkpoint,
        restore_torch_into_state,
    )

    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    if (("cpu" in platforms or poly_batch)
            and (getattr(cfg, "use_pallas_attn_eval", False)
                 or getattr(cfg, "fuse_mlp", False))):
        # Mosaic custom calls only lower for tpu, and only at static
        # shapes — a cpu-containing OR batch-polymorphic artifact must
        # trace the XLA eval attention and MLP chain (identical math;
        # the fused kernels are TPU-only speed paths). Fixed-shape
        # tpu-only exports keep the kernels.
        import dataclasses

        cfg = dataclasses.replace(cfg, use_pallas_attn_eval=False,
                                  fuse_mlp=False)
    if dgl:
        cls = (AVClassifierSwinDGL if cfg.backbone == "swin"
               else AVClassifierDGL)
    else:
        cls = AVClassifierSwin if cfg.backbone == "swin" else AVClassifier
    model = cls(config=cfg, dtype=dtype)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               make_optimizer(cfg, 1))
    if is_torch_checkpoint(ckpt_path):
        state = restore_torch_into_state(state, load_torch_checkpoint(
            ckpt_path, cfg))
    else:
        state = restore_params_into_state(state, load_legacy_checkpoint(
            ckpt_path, cfg))

    b = batch_size or cfg.batch_size
    f, t = cfg.spec_shape
    audio = jnp.zeros((b, f, t, 1), jnp.float32)
    visual = jnp.zeros((b, cfg.fps, 224, 224, 3), jnp.float32)
    exported = export_eval(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        (audio, visual), platforms=platforms, poly_batch=poly_batch)
    save_exported(exported, out_path)
    return exported


def export_intermediate_from_checkpoint(cfg, model_name: str,
                                        ckpt_path: str, out_path: str,
                                        batch_size: Optional[int] = None,
                                        platforms: Sequence[str] = ("cpu",
                                                                    "tpu"),
                                        share_streams: bool = False,
                                        poly_batch: bool = False,
                                        **model_kwargs):
    """main_intermediate.py --export_path: AOT-export the intermediate
    family's eval forward (MMTM 'triple' (out, out_a, out_v), SE-fusion
    'single' logits, SURF_Fomer_N 7-tuple — models/intermediate.py) from
    a legacy checkpoint written by that driver. The exported callable
    takes the preprocessed eval tensors (audio [B,F,T,1] f32, visual
    [B,1,224,224,3] f32; the AV adapter runs inside the artifact,
    mmtm_net.py:381-387). Torch .pth interop is not wired here: the
    reference never released intermediate-family checkpoints (its
    surf_mmfomer/mmtm nets are not CLI-reachable upstream, SURVEY §2.6).

    cpu-containing artifacts force the XLA self-attention eval path —
    the fused Pallas eval kernel (models/transformer.py SA_PALLAS_EVAL)
    is a Mosaic custom call that only lowers for tpu; tpu-only exports
    keep it. The gate is threaded immutably via the model's `use_pallas`
    constructor flag (same pattern as export_from_checkpoint's
    dataclasses.replace on use_pallas_attn_eval) — no module-global
    mutation, so concurrent traces in the same process are unaffected."""
    from gdl_tpu.models.intermediate import build_intermediate
    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.train.optim import make_optimizer
    from gdl_tpu.utils.checkpoint import (
        load_legacy_checkpoint,
        restore_params_into_state,
    )

    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    model, kind = build_intermediate(model_name, cfg.n_classes,
                                     cfg.encoder_width, dtype=dtype,
                                     share_streams=share_streams,
                                     use_pallas=("cpu" not in platforms
                                                 and not poly_batch),
                                     **model_kwargs)
    f, t = cfg.spec_shape
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "drop": rng, "dropout": rng, "pe": rng},
        jnp.zeros((2, f, t, 1), jnp.float32),
        jnp.zeros((2, 1, 224, 224, 3), jnp.float32),
        train=False, av_inputs=True)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=make_optimizer(cfg, 1).init(
                           variables["params"]))
    state = restore_params_into_state(
        state, load_legacy_checkpoint(ckpt_path, cfg))

    b = batch_size or cfg.batch_size
    audio = jnp.zeros((b, f, t, 1), jnp.float32)
    visual = jnp.zeros((b, 1, 224, 224, 3), jnp.float32)
    exported = export_eval(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        (audio, visual), platforms=platforms,
        apply_kwargs={"av_inputs": True}, poly_batch=poly_batch)
    save_exported(exported, out_path)
    return exported
