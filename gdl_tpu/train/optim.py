"""Optimizers, LR schedules, and the OGM / OGM-GE gradient modulation.

Numerics parity with the reference:

- SGD (main_dgl.py:248-250): torch SGD(momentum=0.9, weight_decay=1e-4) with
  COUPLED weight decay (added to the gradient before the momentum buffer) and
  a preceding clip_grad_norm_(max_norm=40) (main_dgl.py:129). Optax chain:
  clip_by_global_norm(40) → add_decayed_weights(1e-4) → trace(0.9) → -lr.
- AdaGrad (main_dgl.py:252-254): torch defaults (eps 1e-10, acc init 0).
- Adam (main_dgl.py:255-257): actually torch AdamW(betas=(0.9, 0.999)) with
  its default decoupled weight decay 0.01.
- MultiStepLR with the reference's scheduler-at-epoch-top quirk
  (main_dgl.py:73-74): `scheduler.step()` runs at the TOP of every epoch, so
  a milestone m takes effect during epoch m-1 (0-indexed) — one epoch
  earlier than textbook MultiStepLR. `lr_for_epoch` reproduces this.
- GradualWarmupScheduler (main.py:360-422): linear warmup over
  `total_epoch` epochs toward base_lr*multiplier, then the after-scheduler.
- OGM / OGM-GE modulation: the per-modality gradient scaling specified (as
  commented-out code, the only spec that exists) at main.py:286-332 — Eq. 10
  of the OGM-GE paper with the tanh coefficient, masked to 4-D conv kernels
  and the [modulation_starts, modulation_ends] epoch window; the GE variant
  adds zero-mean Gaussian noise with per-tensor grad std.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from gdl_tpu.config import Config

# A/B gate for global_norm_fused: materialize big gradient leaves
# (optimization_barrier) before their sumsq instead of letting XLA fuse
# the reduce into the dW producer fusions. Benchmarks toggle it
# (run_all.py swin_bs32_gnbarrier); plain Python bool read at trace time.
GN_MATERIALIZE_BARRIER = False


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    """LR in effect during 0-indexed `epoch` under the reference schedule."""
    base = cfg.learning_rate
    if cfg.optimizer != "sgd":
        return base  # scheduler=None for AdaGrad/Adam (main_dgl.py:252-257)
    if getattr(cfg, "warmup", False):
        # GradualWarmupScheduler(multiplier=1): lr = base * (last_epoch /
        # total_epoch), stepped with epoch+1 at the epoch top
        # (main.py:131-132, :390-391), then the MultiStep after-scheduler.
        e = epoch + 1
        if e <= cfg.total_epoch:
            return base * (float(e) / cfg.total_epoch)
        decays = sum(1 for m in cfg.lr_decay_step
                     if (e - cfg.total_epoch) >= m)
        return base * (cfg.lr_decay_ratio ** decays)
    decays = sum(1 for m in cfg.lr_decay_step if epoch + 1 >= m)
    return base * (cfg.lr_decay_ratio ** decays)


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable:
    def schedule(step):
        epoch = step // steps_per_epoch
        base = cfg.learning_rate
        if cfg.optimizer != "sgd":
            return jnp.asarray(base, jnp.float32)
        milestones = jnp.asarray(cfg.lr_decay_step or [0], jnp.int32)
        if getattr(cfg, "warmup", False):
            e = epoch + 1
            warm = base * e.astype(jnp.float32) / cfg.total_epoch
            decays = jnp.sum((e - cfg.total_epoch) >= milestones) * (
                len(cfg.lr_decay_step) > 0)
            after = base * (cfg.lr_decay_ratio ** decays)
            return jnp.where(e <= cfg.total_epoch, warm, after)
        if not cfg.lr_decay_step:
            return jnp.asarray(base, jnp.float32)
        decays = jnp.sum((epoch + 1) >= milestones)
        return base * (cfg.lr_decay_ratio ** decays)

    return schedule


def dead_fusion_param_mask(cfg: Config, dgl: bool):
    """Weight-decay mask for params torch's SGD would SKIP entirely.

    In the reference DGL loop, fusion params whose only gradients come
    from the erased unimodal backward end the step with grad=None —
    ConcatFusion_DGL's dead `fc_auxi` (fusion_modules.py:49) and
    GatedFusion_DGL's `fc_x`/`fc_y` (post-fc detach, :235-244) — and torch
    optimizers skip grad-None params: no weight decay, no momentum; they
    are frozen at init. With a dense zero gradient, coupled wd would decay
    them slowly; this mask reproduces the frozen behavior exactly
    (tests/test_trajectory_parity.py). Returns None when no param is dead.
    """
    dead = ()
    if dgl and cfg.modality == "full":
        if cfg.fusion_method == "concat":
            dead = ("fc_auxi",)
        elif cfg.fusion_method == "gated":
            dead = ("fc_x", "fc_y")
    if not dead:
        return None

    def mask(params):
        def rule(path, leaf):
            names = [getattr(p, "key", "") for p in path]
            return not (any("fusion" in n for n in names)
                        and any(d in names for d in dead))

        return jax.tree_util.tree_map_with_path(rule, params)

    return mask


def global_norm_fused(tree, small_elems: int = 65536) -> jnp.ndarray:
    """`optax.global_norm` with the SMALL leaves batched into one
    reduction instead of one reduce kernel each.

    Motivation (measured, benchmarks/RESULTS.md "swin levers"): dual
    Swin-B carries ~680 gradient leaves, and the per-leaf reductions cost
    8.0 ms/step of the joint train step — almost all fixed per-kernel
    overhead (the HBM floor for re-reading every gradient once is
    ~0.9 ms). ~500 of those leaves are tiny (biases, LayerNorm scales,
    relative-position tables — a few MB total): concatenating just those
    collapses ~500 launches at negligible extra traffic. Large matrices
    stay per-leaf — concatenating EVERYTHING was measured a clear LOSS
    (swin joint bs32 208.5 -> 190.7 clips/s: the ~680-operand concat of a
    700 MB flat vector costs more writes + memory pressure than the
    launches it saves; RESULTS.md round-3).

    NOT for model-parallel trees: concatenating leaves with different
    shardings forces XLA to all-gather every mp-sharded gradient (caught
    by tests/test_collectives.py) — callers gate on cfg.mp == 1 and keep
    `optax.global_norm` (per-leaf, sharding-preserving) otherwise.

    Numerics: squares accumulate in float32 regardless of leaf dtype
    (gradients are f32 here, so this matches optax's promotion); the sum
    is a different association order than optax's per-leaf-then-scalar
    sum, so results agree only to float rounding (~1e-7 rel — covered by
    tests/test_optim.py)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    small = [x for x in leaves if x.size < small_elems]
    big = [x for x in leaves if x.size >= small_elems]
    sumsq = jnp.zeros((), jnp.float32)
    if small:
        flat = jnp.concatenate(
            [jnp.ravel(x).astype(jnp.float32) for x in small])
        sumsq = sumsq + jnp.sum(jnp.square(flat))
    for x in big:
        # one-shot per-leaf reduce ON PURPOSE: XLA fuses each big leaf's
        # sumsq into its dW GEMM epilogue — an mmformer --no_clip A/B
        # measured the whole clip at <=0.5 ms/step (74.25 vs 74.37 ms),
        # and a two-stage row-reduce + optimization_barrier variant was
        # exactly neutral (benchmarks/RESULTS.md round-3c). The
        # multiply_reduce_fusion ops that LOOK like slow scalar reduces
        # in profiles are those dW GEMMs running near roofline.
        if GN_MATERIALIZE_BARRIER:
            # A/B gate: force each big gradient to MATERIALIZE before
            # its sumsq (the norm becomes a standalone HBM re-read)
            # instead of fusing the reduce into the dW producer.
            x = jax.lax.optimization_barrier(x)
        sumsq = sumsq + jnp.sum(
            jnp.square(jnp.ravel(x).astype(jnp.float32)))
    return jnp.sqrt(sumsq)


def clip_by_global_norm_fused(max_norm: float) -> optax.GradientTransformation:
    """Drop-in for `optax.clip_by_global_norm` with the fused norm.

    Same update rule (torch clip_grad_norm_ semantics at main_dgl.py:129
    modulo torch's 1e-6 epsilon — identical to what optax implements):
    leave updates untouched when ||g|| < max_norm, else scale every leaf
    by max_norm/||g||."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = global_norm_fused(updates)
        trigger = g_norm < max_norm
        updates = jax.tree_util.tree_map(
            lambda t: jnp.where(trigger, t,
                                (t / g_norm.astype(t.dtype)) * max_norm),
            updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: Config, steps_per_epoch: int, clip_norm=40.0,
                   wd_mask=None) -> optax.GradientTransformation:
    """The full update chain for a reference driver run.

    clip_norm=None omits the in-chain clip — used by the joint/OGM path,
    which clips explicitly BEFORE gradient modulation to match the
    reference order (main.py:240 clip_grad_norm_, then the :286-332
    modulation block); re-clipping the modulated gradients would change
    the final update whenever the raw norm exceeds 40.

    wd_mask (see dead_fusion_param_mask) exempts structurally-dead params
    from weight decay, matching torch's skip of grad-None params."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    # fused (single-reduction) clip on pure-dp meshes; per-leaf optax clip
    # when model parallelism is active (the concat would all-gather every
    # mp-sharded gradient — see global_norm_fused docstring)
    clip = (optax.identity() if clip_norm is None
            else (clip_by_global_norm_fused(clip_norm)
                  if getattr(cfg, "mp", 1) == 1
                  else optax.clip_by_global_norm(clip_norm)))
    if cfg.optimizer == "sgd":
        return optax.chain(
            clip,
            optax.add_decayed_weights(1e-4, mask=wd_mask),
            optax.trace(decay=0.9, nesterov=False),
            optax.scale_by_learning_rate(schedule),
        )
    if cfg.optimizer == "AdaGrad":
        return optax.chain(
            clip,
            optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10),
            optax.scale_by_learning_rate(schedule),
        )
    if cfg.optimizer == "Adam":
        return optax.chain(
            clip,
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(0.01, mask=wd_mask),  # torch AdamW
            optax.scale_by_learning_rate(schedule),
        )
    raise ValueError("unknown optimizer {}".format(cfg.optimizer))


# ---------------------------------------------------------------------------
# OGM / OGM-GE gradient modulation (main.py:286-332 spec)
# ---------------------------------------------------------------------------


def ogm_coefficients(out_a: jnp.ndarray, out_v: jnp.ndarray,
                     labels: jnp.ndarray, alpha: float):
    """(coeff_a, coeff_v) from the label-softmax score ratio (main.py:287-306).
    """
    pa = jax.nn.softmax(out_a.astype(jnp.float32), axis=-1)
    pv = jax.nn.softmax(out_v.astype(jnp.float32), axis=-1)
    idx = jnp.arange(labels.shape[0])
    score_a = jnp.sum(pa[idx, labels])
    score_v = jnp.sum(pv[idx, labels])
    ratio_v = score_v / score_a
    ratio_a = 1.0 / ratio_v
    coeff_when_v_big = (1.0 - jnp.tanh(alpha * jax.nn.relu(ratio_v)), 1.0)
    coeff_when_a_big = (1.0, 1.0 - jnp.tanh(alpha * jax.nn.relu(ratio_a)))
    v_big = ratio_v > 1.0
    coeff_v = jnp.where(v_big, coeff_when_v_big[0], coeff_when_a_big[0])
    coeff_a = jnp.where(v_big, coeff_when_v_big[1], coeff_when_a_big[1])
    return coeff_a, coeff_v


def apply_ogm(grads, coeff_a, coeff_v, rng: jax.Array, mode: str,
              active) -> dict:
    """Scale encoder conv-kernel grads by the modality coefficient; OGM_GE
    adds N(0, std(g)+1e-8) noise (main.py:314-330). `active` is a traced
    bool for the epoch window; grads is the full param-tree gradient with
    top-level 'audio_net' / 'visual_net' keys (mirroring the reference's
    name-based selection at main.py:315-318)."""
    if mode not in ("OGM", "OGM_GE"):
        return grads

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    treedef = jax.tree_util.tree_structure(grads)
    keys = jax.random.split(rng, len(flat))
    new_leaves = []
    for (path, g), key in zip(flat, keys):
        names = [getattr(p, "key", "") for p in path]
        top = names[0] if names else ""
        coeff = None
        if "audio" in top:
            coeff = coeff_a
        elif "visual" in top:
            coeff = coeff_v
        if coeff is not None and g.ndim == 4:  # conv kernels only
            mod = g * coeff
            if mode == "OGM_GE":
                noise = jax.random.normal(key, g.shape, g.dtype) * (
                    jnp.std(g) + 1e-8)
                mod = mod + noise
            g = jnp.where(active, mod, g)
        new_leaves.append(g)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
