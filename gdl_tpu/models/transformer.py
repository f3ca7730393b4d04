"""Transformer primitives for the mmformer family — capability parity with
the live subset of models/lib/ (SURVEY §2.7): tanh-approx GELU
(Transformer.py:9-14), SelfAttention (:17-51), pre-norm residual blocks
(:54-96), TransformerModel returning all intermediate outputs (:99-130 via
IntmdSequential.py:4-18), mmTransformerModel (:133-206, whose live forward
is depth × [attn, ffn] over the concatenated token stream), and the
positional encodings (PositionalEncoding.py:4-36).

Also the modality-dropout augmentations (models/lib/model_arch.py:73-202):
`modality_drop` — per-sample uniform choice over the 7 non-empty modality
combinations — and `unbalance_modality_drop` — an epoch-curriculum that
oversamples the hard single-modality combinations after epoch 15 (the
reference hardcodes batch 64 at model_arch.py:178; here any batch size).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

trunc02 = nn.initializers.truncated_normal(stddev=0.02)

# Module-level kill switch for the fused self-attention kernel —
# benchmarks flip it for A/B runs; models gate on it in addition to
# the per-module use_pallas field and the TPU/train check.
SA_PALLAS_ENABLED = True

# Attention-prob dropout implementation inside the fused kernel:
# 'kernel' = in-kernel Mosaic PRNG, regenerated in the backward — the
# profiled mmformer step spends ~10% materializing/copying/re-reading
# the score-sized HBM masks ('hbm'). Read at trace time; TPU-only
# (the op falls back to 'hbm' off-TPU). Mask bits differ from 'hbm'
# (implementation-defined, same class as cfg.fast_dropout_rng).
SA_DROPOUT_IMPL = "kernel"

MODALITY_COMBINATIONS = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1],
     [1, 1, 1]], np.float32)


def gelu_tanh(x):
    """The reference's hand-written tanh GELU (Transformer.py:9-14) — the
    same formula as jax.nn.gelu(approximate=True)."""
    return jax.nn.gelu(x, approximate=True)


class SelfAttention(nn.Module):
    """Transformer.py:17-51: qkv (no bias), scaled dot-product, proj.

    On TPU at train time the scaled-dot-product + softmax + attention-prob
    dropout runs as the fused Pallas kernel (ops/self_attention.py — the
    mmformer round-3 perf lever); eval and CPU use the XLA path below
    (pure forward is faster un-fused, matching the WindowAttention gate)."""

    dim: int
    heads: int = 8
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype,
                       name="qkv")(x)
        from gdl_tpu.models import transformer as _t

        use_kernel = (self.use_pallas and _t.SA_PALLAS_ENABLED and train
                      and jax.default_backend() == "tpu"
                      and head_dim <= 128 and 128 % head_dim == 0)
        if use_kernel:
            from gdl_tpu.ops.self_attention import self_attention_qkv

            rng = (self.make_rng("dropout")
                   if self.dropout_rate > 0.0 else None)
            out = self_attention_qkv(
                qkv.reshape(b, n, 3, self.dim), self.heads,
                scale=head_dim ** -0.5, dropout_rate=self.dropout_rate,
                dropout_rng=rng, train=True,
                dropout_impl=_t.SA_DROPOUT_IMPL)
        else:
            qkv = qkv.reshape(b, n, 3, self.heads, head_dim).transpose(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn * head_dim ** -0.5, axis=-1)
            attn = nn.Dropout(self.dropout_rate,
                              deterministic=not train)(attn.astype(x.dtype))
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(out)


class FeedForward(nn.Module):
    """Transformer.py:83-96."""

    dim: int
    hidden_dim: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu_tanh(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


class TransformerBlock(nn.Module):
    """Residual(PreNormDrop(attn)) + Residual(PreNorm(ffn))
    (Transformer.py:54-96 composition)."""

    dim: int
    heads: int
    mlp_dim: int
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = SelfAttention(self.dim, self.heads, self.attn_dropout_rate,
                          self.dtype, name="attn")(y, train)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        x = x + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = FeedForward(self.dim, self.mlp_dim, self.dropout_rate,
                        self.dtype, name="ffn")(z, train)
        return x + z


class TransformerModel(nn.Module):
    """Transformer.py:99-130: depth blocks; like the reference (whose
    IntermediateSequential returns every intermediate output), returns
    (final, tuple_of_intermediates)."""

    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, tuple]:
        intermediates = []
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, self.mlp_dim,
                                 self.dropout_rate, self.attn_dropout_rate,
                                 self.dtype, name=f"block{i}")(x, train)
            intermediates.append(x)
        return x, tuple(intermediates)


class MMTransformerModel(nn.Module):
    """mmTransformerModel (Transformer.py:133-206): cross-modal attention by
    running depth × [attn, ffn] over the concatenated token stream (the
    per-modality self-attention lists are dead code there)."""

    modal_num: int
    dim: int
    depth: int = 1
    heads: int = 8
    mlp_dim: int = 4096
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for j in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, self.mlp_dim,
                                 self.dropout_rate, self.attn_dropout_rate,
                                 self.dtype, name=f"cross{j}")(x, train)
        return x


class LearnedPositionalEncoding(nn.Module):
    """Zero-init additive position parameter (PositionalEncoding.py:24-36)."""

    seq_length: int
    embedding_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pe = self.param("position_embeddings", nn.initializers.zeros,
                        (1, self.seq_length, self.embedding_dim))
        return x + pe.astype(x.dtype)


def fixed_positional_encoding(seq_length: int, dim: int) -> np.ndarray:
    """Sinusoidal table (PositionalEncoding.py:4-21)."""
    pe = np.zeros((seq_length, dim), np.float32)
    position = np.arange(seq_length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                 * (-np.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def modality_drop(xs: Sequence[jnp.ndarray], rng: jax.Array,
                  p: Sequence[float] | None = None):
    """Per-sample uniform modality masking over the 7 non-empty 3-modality
    combinations (model_arch.py:73-116). xs: three [B, ...] feature maps;
    p: a fixed combination (e.g. [1, 0, 1]) to apply batch-wide instead of
    sampling. Returns (masked_xs, mask[B, 3])."""
    b = xs[0].shape[0]
    if p is not None and any(p):
        mask = jnp.tile(jnp.asarray(p, jnp.float32)[None], (b, 1))
    else:
        idx = jax.random.randint(rng, (b,), 0, 7)
        mask = jnp.asarray(MODALITY_COMBINATIONS)[idx]
    out = []
    for i, x in enumerate(xs):
        m = mask[:, i].reshape((b,) + (1,) * (x.ndim - 1))
        out.append(x * m)
    return out, mask


def unbalance_modality_drop(xs: Sequence[jnp.ndarray], rng: jax.Array,
                            epoch: int,
                            p: Sequence[float] | None = None):
    """Curriculum-weighted masking (model_arch.py:120-202): before epoch 15
    the 7 combinations fill the batch evenly; after, the hard
    single-modality combos {rgb, depth, rgb+depth-missing} gain
    min(epoch-15, 7) slots each at the expense of the easy ones. The
    reference hardcodes batch 64 (:178); this works for any batch."""
    b = xs[0].shape[0]
    if p is not None and any(p):
        return modality_drop(xs, rng, p)
    mode_avg = b // 7
    counts = np.full(7, mode_avg, np.int32)
    counts[:b % 7] += 1
    if epoch >= 15:
        delta = min(epoch - 15, 7)
        for i in (0, 2, 4):  # hard: single rgb, single depth, rgb+depth
            counts[i] += delta
        for i in (3, 5, 6):
            counts[i] -= delta
        counts = np.clip(counts, 0, None)
        # keep the total == batch
        diff = b - counts.sum()
        counts[1] += diff
    rows = np.repeat(np.arange(7), counts)[:b]
    mask = jnp.asarray(MODALITY_COMBINATIONS)[jnp.asarray(rows)]
    mask = jax.random.permutation(rng, mask, axis=0)
    out = []
    for i, x in enumerate(xs):
        m = mask[:, i].reshape((b,) + (1,) * (x.ndim - 1))
        out.append(x * m)
    return out, mask
