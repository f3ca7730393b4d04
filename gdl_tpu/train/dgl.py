"""The DGL training step — the paper's method, in one backward pass.

Reference semantics (main_dgl.py:69-165):
  1. forward: (out, out_a, out_v) from encoders + DGL fusion
  2. loss_unimodal = (loss_a + loss_v) * alpha; backward(retain_graph=True)
  3. erase grads on every param whose name contains 'fusion'
     (main_dgl.py:114-119)
  4. loss_f.backward() fills the fusion grads
  5. clip_grad_norm_(40); per-encoder |grad| probes; optimizer.step()

TPU-native restatement: one pure loss
    loss = alpha * (CE(out_a) + CE(out_v)) + CE(out)
with
  - out_a/out_v computed by the fusion's `unimodal` method applied with
    STOP-GRADIENTED fusion parameters (== step 3's erasure, done a priori),
  - out computed by the fusion's `fuse` method, which stop-gradients
    internally exactly where the reference detaches (== the detach at
    fusion_modules.py:53-56 etc.).
A single jax.value_and_grad then produces both disentangled streams; the
whole step jit-compiles into one fused XLA program (no graph retention, no
post-hoc grad surgery, replica-invariant under data parallelism — SURVEY §2.9).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from gdl_tpu.config import Config
from gdl_tpu.train.optim import global_norm_fused


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def fast_stream(rng: jax.Array, enable: bool = True) -> jax.Array:
    """Re-key a threefry PRNG key as an 'rbg' key (cfg.fast_dropout_rng).

    Downstream mask/noise draws (dropout, droppath, modality drop, PE eps)
    then lower to XLA's RngBitGenerator — one fused op per draw — instead
    of per-element threefry fusions, which profile at several ms/step on
    the transformer-heavy models (benchmarks/RESULTS.md). fold_in/split on
    the 'rbg' impl remain threefry-strength; only the bit generation
    changes. Distributions are identical; the concrete stream differs,
    exactly as it already differs from the reference's torch RNG."""
    if not enable:
        return rng
    kd = jnp.asarray(jax.random.key_data(rng), jnp.uint32).reshape(-1)
    kd = jnp.tile(kd, 2)[:4]
    return jax.random.wrap_key_data(kd, impl="rbg")


def stop_fusion_gradients(params):
    """Stop-gradient every top-level subtree whose name contains 'fusion' —
    the structural mirror of the reference's
    `'fusion' in name.split('.')[1]` erasure (main_dgl.py:114-119)."""
    out = {}
    for key, sub in params.items():
        if "fusion" in key:
            sub = jax.tree.map(jax.lax.stop_gradient, sub)
        out[key] = sub
    return type(params)(out) if isinstance(params, FrozenDict) else out


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch nn.CrossEntropyLoss() — mean softmax-CE over the batch."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def _encoder_grad_probe(grads, prefix: str) -> jnp.ndarray:
    """sum over params of mean|grad| for one encoder (main_dgl.py:132-143)."""
    total = jnp.zeros((), jnp.float32)
    for key, sub in grads.items():
        if prefix in key:
            for leaf in jax.tree.leaves(sub):
                total = total + jnp.mean(jnp.abs(leaf.astype(jnp.float32)))
    return total


def dgl_loss_fn(model, params, batch_stats, batch: Dict[str, jnp.ndarray],
                cfg: Config, train: bool = True,
                rng: Optional[jax.Array] = None):
    """Pure DGL loss. batch: audio [B,F,T,1], visual [B,T,H,W,3],
    label [B] int32. `rng` feeds stochastic model pieces at train time
    (Swin droppath / dropout)."""
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {}
    if train and rng is not None:
        rng = fast_stream(rng, getattr(cfg, "fast_dropout_rng", True))
        k_dp, k_do = jax.random.split(rng)
        rngs = {"droppath": k_dp, "dropout": k_do}
    if cfg.modality != "full":
        # unimodal runs return the SAME logits thrice (basic_model.py:88-122)
        # and the reference still backprops all three CE losses — nothing is
        # erased because the plain linear classifier has no 'fusion' in its
        # name (main_dgl.py:102-122) — so the effective objective is
        # (2*alpha + 1) * CE. Reproduced exactly: dropping the scale would
        # train the --modality audio/visual baselines with a ~(2a+1)x
        # smaller effective LR than the reference (ADVICE round 1).
        if train:
            (out, _, _), mutated = model.apply(
                variables, batch["audio"], batch["visual"], train=True,
                rngs=rngs, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            out, _, _ = model.apply(
                variables, batch["audio"], batch["visual"], train=False)
            new_stats = batch_stats
        ce = cross_entropy(out, batch["label"])
        loss = (2.0 * cfg.alpha + 1.0) * ce if train else ce
        metrics = {"loss_f": ce, "loss_a": ce, "loss_v": ce,
                   "out": out, "out_a": out, "out_v": out}
        return loss, (new_stats, metrics)

    if train:
        (a, v), mutated = model.apply(
            variables, batch["audio"], batch["visual"], train=True,
            rngs=rngs, method="encode", mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        a, v = model.apply(
            variables, batch["audio"], batch["visual"], train=False,
            method="encode")
        new_stats = batch_stats

    # unimodal (AUXI) stream: live features through frozen-fusion params
    stopped = {"params": stop_fusion_gradients(params),
               "batch_stats": new_stats}
    out_a, out_v = model.apply(stopped, a, v, method="unimodal_logits")
    # fused stream: fusion params live; features detached inside `fuse`
    out = model.apply({"params": params, "batch_stats": new_stats},
                      a, v, method="fused_logits")

    loss_a = cross_entropy(out_a, batch["label"])
    loss_v = cross_entropy(out_v, batch["label"])
    loss_f = cross_entropy(out, batch["label"])
    loss = cfg.alpha * (loss_a + loss_v) + loss_f

    metrics = {"loss_f": loss_f, "loss_a": loss_a, "loss_v": loss_v,
               "out": out, "out_a": out_a, "out_v": out_v}
    return loss, (new_stats, metrics)


def make_dgl_train_step(model, cfg: Config,
                        optimizer: optax.GradientTransformation,
                        clip_norm: float = 40.0,
                        preprocess: Optional[Callable] = None,
                        base_rng: Optional[jax.Array] = None) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics). jit/pjit-ready.

    When `preprocess` is given, the batch arrives RAW ({'wave','frames',
    'label'}) and the whole audio/image frontend runs inside this one
    compiled step (see gdl_tpu/data/preprocess.py); augmentation randomness
    derives deterministically from base_rng and the step counter.

    Metrics include the reference's per-step diagnostics: post-clip
    per-encoder grad-magnitude sums (main_dgl.py:132-143; the clip is a
    positive scalar, so probe_clipped = clip_coef * probe_raw) and mean
    |unimodal logits| (main_dgl.py:146)."""
    if base_rng is None:
        base_rng = jax.random.PRNGKey(cfg.random_seed)

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(base_rng, state.step)
        k_pre, k_model = jax.random.split(rng)
        if preprocess is not None:
            batch = preprocess(batch, k_pre)
        grad_fn = jax.value_and_grad(
            lambda p: dgl_loss_fn(model, p, state.batch_stats, batch, cfg,
                                  train=True, rng=k_model),
            has_aux=True)
        (loss, (new_stats, metrics)), grads = grad_fn(state.params)

        # diagnostics only: the chain's clip recomputes this; XLA CSEs
        # the two. Same mp gate as the chain so the programs match.
        gnorm = (global_norm_fused(grads)
                 if getattr(cfg, "mp", 1) == 1
                 else optax.global_norm(grads))
        clip_coef = jnp.minimum(1.0, clip_norm / (gnorm + 1e-12))
        audio_probe = jnp.zeros((), jnp.float32)
        visual_probe = jnp.zeros((), jnp.float32)
        if cfg.log_grad_csv:  # probes are pure diagnostics; skip when off
            if cfg.modality in ("full", "audio"):
                audio_probe = clip_coef * _encoder_grad_probe(grads,
                                                              "audio_net")
            if cfg.modality in ("full", "visual"):
                visual_probe = clip_coef * _encoder_grad_probe(grads,
                                                               "visual_net")

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        out_metrics = {
            "loss": loss,
            "loss_f": metrics["loss_f"],
            "loss_a": metrics["loss_a"],
            "loss_v": metrics["loss_v"],
            "audio_grad_sum": audio_probe,
            "visual_grad_sum": visual_probe,
            "abs_out_a": jnp.mean(jnp.abs(metrics["out_a"])),
            "abs_out_v": jnp.mean(jnp.abs(metrics["out_v"])),
            "grad_norm": gnorm,
        }
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats,
                          opt_state=new_opt_state), out_metrics

    return train_step


def make_eval_step(model, cfg: Config,
                   preprocess: Optional[Callable] = None) -> Callable:
    """eval_step(state, batch) -> per-example (pred, pred_a, pred_v, label).

    Uses running BN stats (model.eval() semantics, main_dgl.py:186). The
    per-class accuracy accounting (main_dgl.py:189-219) happens on the host
    over the returned argmaxes — numerically identical to the reference's
    per-sample softmax+argmax loop (softmax is monotonic in argmax)."""

    def eval_step(state: TrainState, batch):
        if preprocess is not None:
            batch = preprocess(batch)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        out, out_a, out_v = model.apply(
            variables, batch["audio"], batch["visual"], train=False)
        return {
            "pred": jnp.argmax(out, axis=-1),
            "pred_a": jnp.argmax(out_a, axis=-1),
            "pred_v": jnp.argmax(out_v, axis=-1),
            "label": batch["label"],
        }

    return eval_step


def create_train_state(model, cfg: Config, rng: jax.Array,
                       optimizer: optax.GradientTransformation,
                       spec_shape: Optional[Tuple[int, int]] = None,
                       frames: Optional[int] = None,
                       image_size: int = 224) -> TrainState:
    """Initialize params/batch_stats with dataset-shaped dummies."""
    f, t = spec_shape if spec_shape is not None else cfg.spec_shape
    n_frames = frames if frames is not None else cfg.fps
    audio = jnp.zeros((2, f, t, 1), jnp.float32)
    visual = jnp.zeros((2, n_frames, image_size, image_size, 3), jnp.float32)
    variables = model.init({"params": rng}, audio, visual, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)
