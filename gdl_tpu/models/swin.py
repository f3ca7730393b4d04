"""Swin Transformer encoder, TPU-native (NHWC, Flax, fused window attention).

Capability parity with reference models/swin_transformer.py (686 LoC), a
Microsoft Swin-B modified for this framework's dual-modality use:
  - ctor keyed by modality (audio: 1-channel 224² log-spectrograms from the
    swin dataset variant; visual: [B,T,H,W,3] with the B·T fold,
    swin_transformer.py:605-608)
  - classification head removed (:569); output is the 7×7 feature map
    reshaped from the final token stream (:618-625) — here NHWC
    [B, 7, 7, 1024]
  - optional probabilistic-embedding heads (`pe`): 1×1-conv+BN mu / logvar
    with reparameterized sampling at train, mu at eval, returning
    (pooled_out, mu_map, std_map) (:574-583, :643-674)
  - the optional fused CUDA window kernel (:13-23, absent upstream) is
    superseded by the Pallas fused window attention
    (gdl_tpu/ops/window_attention.py), selectable via `use_pallas_attn`.

Hyperparameters are the reference's Swin-B: embed 128, depths [2,2,18,2],
heads [4,8,16,32], window 7, mlp_ratio 4, qkv_bias, drop_path 0.1,
patch_norm, no APE (swin_transformer.py:513-518 + ctor defaults).
Init matches `_init_weights` (:585-592): trunc-normal(0.02) dense kernels,
zero biases, LayerNorm (1, 0); the relative-position bias tables are
trunc-normal(0.02).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def is_tpu_backend() -> bool:
    """Gate for the Pallas training path. A function (not an inline
    check) so integration tests can monkeypatch it and drive the model's
    Pallas branches on CPU — the ops themselves still check the real
    backend and fall back to interpret mode there."""
    return jax.default_backend() == "tpu"


def _dense(features, dtype, name=None, use_bias=True):
    return nn.Dense(features, dtype=dtype, use_bias=use_bias,
                    kernel_init=trunc02, bias_init=nn.initializers.zeros,
                    name=name)


@functools.lru_cache(maxsize=None)
def relative_position_index(window: int) -> np.ndarray:
    """[N, N] indices into the (2w-1)² bias table (standard Swin recipe)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # [2, w, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """[nW, N, N] additive mask (0 / -100) for shifted windows."""
    img = np.zeros((h, w))
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] → [B·nW, window², C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


# Lower window_shift as four quadrant pieces combined by per-half column
# concats and ONE final row concat, instead of two sequential full-array
# concats. Bit-exact either way (tests); the sequential form materializes
# the intermediate full array between the row and column stages, the
# quadrant form gives XLA smaller concat operands sliced straight from
# the input. Which one the TPU compiler lowers to fewer copy kernels is
# an empirical question — flip to A/B (module-level, read at trace time).
# MEASURED: a wash on the dual-Swin-B joint step bs32 (146.29 ms
# quadrant vs 146.96 sequential, inside tunnel variance) — the default
# stays the simpler sequential form.
SHIFT_QUADRANT_LOWERING = False

# Proj-GEMM boundary lowering (the last profiled copy family around the
# attention kernels: [2048,49,128]-shaped layout conversions feeding the
# projection forward/backward GEMMs, ~0.1 ms x several sites). A/B gated
# via benchmarks/run_all.py swin_bs32_proj*:
#   'n49'    - slice the kernel output to the valid tokens, proj after
#              (the shipping default)
#   'pad56'  - proj the PADDED kernel output directly (GEMM reads the
#              kernel buffer with no slice; pad rows carry zero
#              cotangents so gradients are unchanged), slice after
#   'flat2d' - proj on the flattened [B*N, C] view (forces plain 2D GEMM
#              operand layouts)
PROJ_BOUNDARY = "n49"


def window_shift(xw: jnp.ndarray, shift: int,
                 inverse: bool = False) -> jnp.ndarray:
    """Cyclic shift expressed IN the window-resident layout.

    xw: [B, wh, ww, win, win, C]. Equivalent to window-reverse →
    jnp.roll(±shift, ±shift over the spatial axes) → window-partition
    (the reference's torch.roll at swin_transformer.py:231-234,:247-250),
    but as slice+concat along the in-window axes plus a window-index roll:
    no 7-minor transposes, so XLA emits layout-preserving copies instead
    of the partition/reverse transpose pair. Row derivation: window I row
    r of roll(x, -s) is spatial row 7I+r+s, i.e. window I rows s..6
    followed by window I+1 rows 0..s-1.
    """
    win = xw.shape[3]
    if SHIFT_QUADRANT_LOWERING:
        if not inverse:
            rt, rb = slice(shift, None), slice(None, shift)
            ct, cb = slice(shift, None), slice(None, shift)
            ra, ca = -1, -1
        else:
            rt, rb = slice(win - shift, None), slice(None, win - shift)
            ct, cb = slice(win - shift, None), slice(None, win - shift)
            ra, ca = 1, 1
        r1 = jnp.roll(xw, ra, axis=1)
        c1 = jnp.roll(xw, ca, axis=2)
        rc = jnp.roll(r1, ca, axis=2)
        if not inverse:
            top = jnp.concatenate(
                [xw[:, :, :, rt][:, :, :, :, ct],
                 c1[:, :, :, rt][:, :, :, :, cb]], axis=4)
            bot = jnp.concatenate(
                [r1[:, :, :, rb][:, :, :, :, ct],
                 rc[:, :, :, rb][:, :, :, :, cb]], axis=4)
        else:
            top = jnp.concatenate(
                [rc[:, :, :, rt][:, :, :, :, ct],
                 r1[:, :, :, rt][:, :, :, :, cb]], axis=4)
            bot = jnp.concatenate(
                [c1[:, :, :, rb][:, :, :, :, ct],
                 xw[:, :, :, rb][:, :, :, :, cb]], axis=4)
        return jnp.concatenate([top, bot], axis=3)
    if not inverse:  # windows of roll(x, (-shift, -shift))
        xw = jnp.concatenate(
            [xw[:, :, :, shift:], jnp.roll(xw, -1, axis=1)[:, :, :, :shift]],
            axis=3)
        xw = jnp.concatenate(
            [xw[:, :, :, :, shift:],
             jnp.roll(xw, -1, axis=2)[:, :, :, :, :shift]], axis=4)
    else:  # windows of roll(x, (+shift, +shift))
        xw = jnp.concatenate(
            [jnp.roll(xw, 1, axis=1)[:, :, :, win - shift:],
             xw[:, :, :, :win - shift]], axis=3)
        xw = jnp.concatenate(
            [jnp.roll(xw, 1, axis=2)[:, :, :, :, win - shift:],
             xw[:, :, :, :, :win - shift]], axis=4)
    return xw


class DropPath(nn.Module):
    """Stochastic depth: per-sample residual-branch drop at train."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("droppath"), keep,
                                    mask_shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class _QkvParams(nn.Module):
    """Declares a Dense layer's parameters with EXACTLY the tree and
    init `_dense` would create ({kernel, bias}, float32,
    trunc-normal(0.02) / zeros — swin_transformer.py:585-592) and returns
    them raw — the fused-GEMM Pallas entries (qkv projection, MLP)
    consume the kernels directly instead of calling Dense, so the
    torch-interop name map, init parity, and existing checkpoints stay
    valid (tests/test_swin.py fused-path tests assert tree + init
    equality)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", trunc02,
                            (in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,))
                if self.use_bias else None)
        return kernel, bias


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True
    use_pallas: bool = False
    fuse_qkv: bool = True
    pallas_eval: bool = True  # forward-only fused kernel at EVAL too
    # (no residual writes) — measured 13.21 vs 13.96 ms/step dual-Swin-B
    # eval bs16 against the XLA eval forward (which had beaten the
    # save-p training kernel's pure forward 14.57 vs 16.8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray], train: bool = True):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        table = self.param(
            "relative_position_bias_table", trunc02,
            ((2 * self.window - 1) ** 2, self.num_heads))
        idx = relative_position_index(self.window)
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # [H, N, N]

        # The Pallas path wins the TRAIN step (residual-p backward) but the
        # plain-XLA forward wins inference (14.6 vs 16.8 ms dual Swin-B —
        # the save-p forward also writes a residual nothing consumes), so
        # pallas is gated to training. Off-TPU the kernel only has the
        # (slow) interpret path — XLA there too (CPU tests, dryruns).
        # sa_kernel_supported: the packed-head kernels need the head
        # group to fill whole 128-lane tiles (every Swin-B stage does:
        # d=32, g=4); unaligned custom widths fall back to XLA instead
        # of failing Mosaic compilation (same predicate as
        # SelfAttention — the group-selection math is identical).
        from gdl_tpu.ops.self_attention import sa_kernel_supported

        if (self.use_pallas and train and is_tpu_backend()
                and sa_kernel_supported(self.dim, self.num_heads)):
            # packed-head kernel fed the projection output directly —
            # the per-head split never materializes in HBM. The token pad
            # (49 -> 56) happens BEFORE the projection: padding the C-wide
            # stream fuses into the LayerNorm producer, and the 3C-wide
            # projection GEMM then writes the kernel's padded operand
            # directly — removing the per-site HBM round trip of padding
            # the projection output (the last profiled copy feeding the
            # kernels; valid rows are bit-identical since padded keys are
            # masked by the -1e30 bias columns either way).
            # With fuse_qkv (default) the projection GEMM itself moves
            # INSIDE the kernel: XLA's batch-in-lanes emitter for
            # 3C <= 1536 GEMMs forced a layout-conversion copy at every
            # kernel boundary (12.5 ms/step profiled on the dual-Swin-B
            # joint step — ops/window_attention.py fused-GEMM section).
            n_pad = -(-n // 8) * 8
            xp = x if n_pad == n else jnp.pad(
                x, ((0, 0), (0, n_pad - n), (0, 0)))
            if self.fuse_qkv and self.qkv_bias:
                from gdl_tpu.ops.window_attention import (
                    window_attention_pallas_qkv_fused,
                )

                kernel, kbias = _QkvParams(3 * self.dim, name="qkv")(c)
                out = window_attention_pallas_qkv_fused(
                    xp, kernel.astype(self.dtype),
                    kbias.astype(self.dtype), bias, mask,
                    self.num_heads, n_valid=n,
                    keep_pad=PROJ_BOUNDARY == "pad56")
            else:
                from gdl_tpu.ops.window_attention import (
                    window_attention_pallas_qkv,
                )

                qkv = _dense(3 * self.dim, self.dtype, "qkv",
                             use_bias=self.qkv_bias)(xp)
                out = window_attention_pallas_qkv(
                    qkv.reshape(b, n_pad, 3, self.dim), bias, mask,
                    self.num_heads, n_valid=n)
        elif (not train and self.use_pallas and self.pallas_eval
              and self.fuse_qkv and self.qkv_bias and is_tpu_backend()
              and sa_kernel_supported(self.dim, self.num_heads)):
            # `not train` is explicit (not just implied by the branch
            # above): an unaligned-head TRAIN call must reach the
            # differentiable XLA path, never this forward-only kernel.
            # forward-only fused kernel for EVAL (no residual writes) —
            # opt-in until measured against the XLA eval forward
            from gdl_tpu.ops.window_attention import (
                window_attention_pallas_qkv_fused_eval,
            )

            n_pad = -(-n // 8) * 8
            xp = x if n_pad == n else jnp.pad(
                x, ((0, 0), (0, n_pad - n), (0, 0)))
            kernel, kbias = _QkvParams(3 * self.dim, name="qkv")(c)
            out = window_attention_pallas_qkv_fused_eval(
                xp, kernel.astype(self.dtype), kbias.astype(self.dtype),
                bias, mask, self.num_heads, n_valid=n)
        else:
            from gdl_tpu.ops.window_attention import window_attention_xla_bnhd

            qkv = _dense(3 * self.dim, self.dtype, "qkv",
                         use_bias=self.qkv_bias)(x)
            out = window_attention_xla_bnhd(
                qkv.reshape(b, n, 3, self.num_heads, head_dim), bias, mask)
        proj = _dense(self.dim, self.dtype, "proj")
        if out.shape[1] != n:  # pad56: proj the padded rows, slice after
            return proj(out)[:, :n]
        if PROJ_BOUNDARY == "flat2d" and out.ndim == 3:
            return proj(out.reshape(-1, c)).reshape(b, n, self.dim)
        return proj(out)


class SwinBlock(nn.Module):
    """One Swin block. Two data layouts, identical math and param tree:

    - spatial (`resident=False`): x is [B, H·W, C]; window partition /
      reverse transposes happen inside the block (the reference layout,
      swin_transformer.py:176-268).
    - window-resident (`resident=True`): x is [B, wh, ww, win, win, C];
      the stage loop partitions ONCE and blocks stay in window-major
      layout — the cyclic shift runs via `window_shift` slice+concats.
      This removes the per-block partition/reverse transpose pair that
      profiled at 34% of the dual-Swin-B step (benchmarks/RESULTS.md).
    """

    dim: int
    resolution: Tuple[int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_pallas: bool = False
    fuse_qkv: bool = True
    pallas_eval: bool = True
    fuse_mlp: bool = False  # run fc1+gelu+fc2 as ONE Pallas kernel with
    # the 4C intermediate VMEM-resident (ops/mlp.py); recompute backward.
    # Param tree/init identical to the Dense chain (_QkvParams).
    resident: bool = False
    dtype: Any = jnp.float32

    def _mlp(self, y):
        """fc1 -> exact gelu -> fc2 on [..., C]; fused Pallas kernel when
        gated on and the flattened shape is supported (Swin-B stages 0-2;
        stage 3's 16.8 MB weights fall back — ops/mlp.py)."""
        c = y.shape[-1]
        hid = int(self.dim * self.mlp_ratio)
        if self.fuse_mlp and is_tpu_backend():
            from gdl_tpu.ops.mlp import mlp_fused, mlp_kernel_supported

            # concrete shapes only here: the fused kernel's grid is
            # static, and poly-batch exports force fuse_mlp off
            # (serve.py) — so int() never sees a symbolic dim
            m = int(np.prod(y.shape[:-1]))
            if mlp_kernel_supported(m, c, hid,
                                    jnp.dtype(self.dtype).itemsize):
                w1, b1 = _QkvParams(hid, name="mlp_fc1")(c)
                w2, b2 = _QkvParams(self.dim, name="mlp_fc2")(hid)
                out = mlp_fused(y.reshape(m, c).astype(self.dtype),
                                w1.astype(self.dtype),
                                b1.astype(self.dtype),
                                w2.astype(self.dtype),
                                b2.astype(self.dtype))
                return out.reshape(y.shape)
        y = _dense(hid, self.dtype, "mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        return _dense(self.dim, self.dtype, "mlp_fc2")(y)

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = self.resolution
        window = min(self.window, min(h, w))
        shift = self.shift if window < min(h, w) else 0

        if self.resident:
            b, wh, ww, _, _, c = x.shape
            shortcut = x
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
            if shift > 0:
                y = window_shift(y, shift)
                mask = jnp.asarray(shift_attn_mask(h, w, window, shift))
            else:
                mask = None
            att = y.reshape(b * wh * ww, window * window, c)
            att = WindowAttention(self.dim, window, self.num_heads,
                                  use_pallas=self.use_pallas,
                                  fuse_qkv=self.fuse_qkv,
                                  pallas_eval=self.pallas_eval,
                                  dtype=self.dtype, name="attn")(att, mask,
                                                                 train)
            att = att.reshape(b, wh, ww, window, window, c)
            if shift > 0:
                att = window_shift(att, shift, inverse=True)
            x = shortcut + DropPath(self.drop_path,
                                    name="drop_path1")(att, train)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
            y = self._mlp(y)
            return x + DropPath(self.drop_path, name="drop_path2")(y, train)

        b, l, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, window, shift))
        else:
            mask = None
        x = window_partition(x, window)
        x = WindowAttention(self.dim, window, self.num_heads,
                            use_pallas=self.use_pallas,
                            fuse_qkv=self.fuse_qkv,
                            pallas_eval=self.pallas_eval, dtype=self.dtype,
                            name="attn")(x, mask, train)
        x = window_reverse(x, window, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(b, l, c)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, train)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = self._mlp(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class PatchMerging(nn.Module):
    resolution: Tuple[int, int]
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = self.resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return _dense(2 * self.dim, self.dtype, "reduction",
                      use_bias=False)(x)


class PatchEmbed(nn.Module):
    patch_size: int = 4
    embed_dim: int = 128
    patch_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, kernel_init=trunc02,
                    bias_init=nn.initializers.zeros, name="proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x, (h, w)


class SwinTransformer(nn.Module):
    """Swin-B feature encoder; `__call__` returns the [N, 7, 7, 1024] map
    (or the (pooled, mu, std) PE tuple when pe=True)."""

    modality: str  # 'audio' | 'visual'
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    pe: bool = False
    use_pallas_attn: bool = False
    fuse_qkv_gemm: bool = True  # run the qkv projection INSIDE the Pallas
    # kernel (layout-conversion copies; see WindowAttention)
    pallas_attn_eval: bool = True  # forward-only fused kernel at eval
    # (measured win, see WindowAttention.pallas_eval)
    fuse_mlp: bool = False  # fused fc1+gelu+fc2 Pallas kernel
    # (ops/mlp.py, SwinBlock.fuse_mlp) — stages 0-2; stage 3 stays XLA
    use_checkpoint: bool = False  # rematerialize blocks (the reference
    # ctor's use_checkpoint flag) — trades recompute for activation memory
    window_resident: bool = False  # keep the token stream window-major
    # across each stage (partition once per stage, shift via slice+concat)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.modality == "visual":
            b, t, h, w, c = x.shape
            x = x.reshape(b * t, h, w, c)
        x = x.astype(self.dtype)

        x, (h, w) = PatchEmbed(self.patch_size, self.embed_dim,
                               dtype=self.dtype, name="patch_embed")(x)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        block_idx = 0
        dim = self.embed_dim
        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) \
            if self.use_checkpoint else SwinBlock
        for stage, depth in enumerate(self.depths):
            win = min(self.window, min(h, w))
            resident = (self.window_resident
                        and h % win == 0 and w % win == 0)
            if resident:  # ONE partition transpose for the whole stage
                bn = x.shape[0]
                x = x.reshape(bn, h // win, win, w // win, win, dim)
                x = x.transpose(0, 1, 3, 2, 4, 5)
            for i in range(depth):
                x = block_cls(
                    dim=dim, resolution=(h, w),
                    num_heads=self.num_heads[stage], window=self.window,
                    shift=0 if i % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[block_idx]),
                    use_pallas=self.use_pallas_attn,
                    fuse_qkv=self.fuse_qkv_gemm,
                    pallas_eval=self.pallas_attn_eval,
                    fuse_mlp=self.fuse_mlp, resident=resident,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{i}")(x, train)
                block_idx += 1
            if resident:  # ONE reverse transpose at stage end
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bn, h * w, dim)
            if stage < len(self.depths) - 1:
                x = PatchMerging((h, w), dim, dtype=self.dtype,
                                 name=f"merge{stage}")(x)
                h, w, dim = h // 2, w // 2, dim * 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        feat_map = x.reshape(x.shape[0], h, w, dim)  # [N, 7, 7, 1024]

        if not self.pe:
            return feat_map

        from gdl_tpu.models.classifier import PEHead

        out_map, mu, std = PEHead(dim, self.dtype, name="pe_head")(
            feat_map, train=train)
        out = jnp.mean(out_map, axis=(1, 2))
        return out, mu, std
