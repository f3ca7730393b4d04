"""Audio-visual classifier assemblies.

`AVClassifierDGL` has full parity with reference models/basic_model.py:10-124
(the only classifier that survives in the reference source). `AVClassifier`
reconstructs the MISSING class expected by main.py:497 purely from its
call-site contract (main.py:164-165 11-tuple, main.py:191-202 `pe` sentinel
behavior, main.py:441/481 `drop` toggling) — the reference file was lost and
only a stale .pyc remained; see SURVEY.md §2.5.

TPU-native layout: audio spectrograms are [B, F, T, 1] (NHWC), visual frame
stacks are [B, T, H, W, 3]; pooling uses plain means (XLA fuses them into
the surrounding graph).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdl_tpu.config import Config
from gdl_tpu.models.fusion import make_fusion
from gdl_tpu.models.layers import batch_norm, dense_xavier_init
from gdl_tpu.models.resnet import resnet18


def _classifier_dense(n_classes: int, dtype, name: str) -> nn.Dense:
    return nn.Dense(n_classes, dtype=dtype, kernel_init=dense_xavier_init,
                    bias_init=nn.initializers.zeros, name=name)


class PEHead(nn.Module):
    """Probabilistic-embedding (DUL) head: 1x1-conv+BN mu / logvar branches
    with a reparameterized sample at train time, mu at eval
    (reference models/swin_transformer.py:574-583, :643-667).

    Input/output are NHWC feature maps; returns (sampled_map, mu, std)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mu = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                     name="mu_conv")(x)
        mu = batch_norm(train, self.dtype, name="mu_bn")(mu)
        logvar = nn.Conv(self.features, (1, 1), use_bias=True,
                         dtype=self.dtype, name="logvar_conv")(x)
        logvar = batch_norm(train, self.dtype, name="logvar_bn")(logvar)
        std = jnp.exp(0.5 * logvar)
        if train:
            eps = jax.random.normal(self.make_rng("pe"), std.shape, std.dtype)
            out = mu + eps * std
        else:
            out = mu
        return out, mu, std


def _pool_audio(a_map: jnp.ndarray) -> jnp.ndarray:
    """adaptive_avg_pool2d(a, 1) + flatten (basic_model.py:78,81)."""
    return jnp.mean(a_map, axis=(1, 2))


def _pool_visual(v_map: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Unfold time from batch, adaptive_avg_pool3d + flatten
    (basic_model.py:73-82)."""
    bt, h, w, c = v_map.shape
    v = v_map.reshape(batch, bt // batch, h, w, c)
    return jnp.mean(v, axis=(1, 2, 3))


class AVClassifierDGL(nn.Module):
    """Dual ResNet-18 encoders + a DGL fusion head (basic_model.py:10-124).

    `__call__` returns the reference tuple order `(out, out_a, out_v)`
    (basic_model.py:86). The DGL train step instead calls `encode` /
    `unimodal_logits` / `fused_logits` separately to place the two
    stop-gradient streams (see gdl_tpu/train/dgl.py)."""

    config: Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        n = cfg.n_classes
        w, stages = cfg.encoder_width, cfg.encoder_stages
        g = cfg.bn_groups
        if cfg.modality == "full":
            self.audio_net = resnet18("audio", self.dtype, w, stages,
                                      bn_groups=g)
            self.visual_net = resnet18("visual", self.dtype, w, stages,
                                       bn_groups=g)
            self.fusion_module = make_fusion(
                cfg.fusion_method, n, dgl=True, input_dim=cfg.encoder_dim,
                dtype=self.dtype)
        elif cfg.modality == "visual":
            self.visual_net = resnet18("visual", self.dtype, w, stages,
                                       bn_groups=g)
            self.visual_classifier = _classifier_dense(
                n, self.dtype, "visual_classifier")
        elif cfg.modality == "audio":
            self.audio_net = resnet18("audio", self.dtype, w, stages,
                                      bn_groups=g)
            self.audio_classifier = _classifier_dense(
                n, self.dtype, "audio_classifier")

    def encode(self, audio, visual, train: bool = False):
        """Pooled per-modality features (a[B,512], v[B,512])."""
        a_map = self.audio_net(audio, train=train)
        v_map = self.visual_net(visual, train=train)
        return _pool_audio(a_map), _pool_visual(v_map, audio.shape[0])

    def unimodal_logits(self, a, v):
        return self.fusion_module.unimodal(a, v)

    def fused_logits(self, a, v):
        return self.fusion_module.fuse(a, v)

    def __call__(self, audio, visual, train: bool = False):
        cfg = self.config
        if cfg.modality == "full":
            a, v = self.encode(audio, visual, train=train)
            a_out, v_out, out = self.fusion_module(a, v)
            return out, a_out, v_out
        if cfg.modality == "visual":
            v_map = self.visual_net(visual, train=train)
            v = _pool_visual(v_map, visual.shape[0])
            out = self.visual_classifier(v)
            return out, out, out
        if cfg.modality == "audio":
            a_map = self.audio_net(audio, train=train)
            a = _pool_audio(a_map)
            out = self.audio_classifier(a)
            return out, out, out
        return 0, 0, 0


def _modality_drop(a, v, rng):
    """Per-sample random modality masking over the combinations
    {audio-only, visual-only, both} — the 2-modality specialization of the
    reference's `modality_drop` augmentation (models/lib/model_arch.py:73-116),
    gated by `args.drop` (main.py:72, toggled around eval at main.py:441,481).
    """
    b = a.shape[0]
    combo = jax.random.randint(rng, (b,), 0, 3)
    keep_a = jnp.where(combo == 1, 0.0, 1.0)[:, None]
    keep_v = jnp.where(combo == 0, 0.0, 1.0)[:, None]
    return a * keep_a, v * keep_v


class AVClassifier(nn.Module):
    """Joint-training classifier (main.py path) — reconstructed contract.

    forward returns the 11-tuple consumed at main.py:164-165:
      (a, v, out, a_feature, v_feature, a_mul, a_std, v_mul, v_std,
       out_a, out_v)
    where a/v are pooled features, out the fused logits from a BASELINE
    (non-DGL) fusion, a_feature/v_feature the pre-pool layer-4 maps (fed to
    get_feature_diversity, main.py:183-184), mu/std the PE-head outputs (the
    int 0 sentinel when pe=0 — cf. isinstance check at main.py:191-202), and
    out_a/out_v unimodal diagnostic logits (overwritten with `out` by the
    reference's own valid(), main.py:459-460).
    """

    config: Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        n = cfg.n_classes
        w, stages = cfg.encoder_width, cfg.encoder_stages
        self.audio_net = resnet18("audio", self.dtype, w, stages,
                                  bn_groups=cfg.bn_groups)
        self.visual_net = resnet18("visual", self.dtype, w, stages,
                                   bn_groups=cfg.bn_groups)
        self.fusion_module = make_fusion(
            cfg.fusion_method, n, dgl=False, input_dim=cfg.encoder_dim,
            dtype=self.dtype)
        if cfg.pe:
            self.audio_pe = PEHead(cfg.encoder_dim, self.dtype)
            self.visual_pe = PEHead(cfg.encoder_dim, self.dtype)

    def __call__(self, audio, visual, train: bool = False):
        cfg = self.config
        a_feature = self.audio_net(audio, train=train)
        v_feature = self.visual_net(visual, train=train)

        if cfg.pe:
            a_map, a_mul, a_std = self.audio_pe(a_feature, train=train)
            v_map, v_mul, v_std = self.visual_pe(v_feature, train=train)
        else:
            a_map, v_map = a_feature, v_feature
            a_mul = a_std = v_mul = v_std = 0

        a = _pool_audio(a_map)
        v = _pool_visual(v_map, audio.shape[0])

        if train and cfg.drop:
            a, v = _modality_drop(a, v, self.make_rng("drop"))

        x_out, y_out, out = self.fusion_module(a, v)

        # unimodal diagnostic logits: zero the other modality through the
        # same fusion head (parameter-shared AUXI shape; the live reference
        # training loop never consumes these — main.py:173-181)
        zeros = jnp.zeros_like(a)
        _, _, out_a = self.fusion_module(a, jnp.zeros_like(v))
        _, _, out_v = self.fusion_module(zeros, v)

        return (a, v, out, a_feature, v_feature,
                a_mul, a_std, v_mul, v_std, out_a, out_v)


class AVClassifierSwin(nn.Module):
    """Swin-backbone joint classifier — reconstruction of the MISSING
    `AVClassifier_SWIN` selected by `--backbone swin` (main.py:500-501;
    SURVEY §2.5): two SwinTransformer(modality) encoders (audio takes the
    1-channel 224x224 spectrogram of CramedDataset_swin,
    dataset/CramedDataset.py:163), a concat head, and the same 11-tuple
    contract as AVClassifier; mu/std come from the Swin PE branch
    (swin_transformer.py:643-667).

    Note: the reference's ConcatFusion_Swin head is sized 768*2
    (fusion_modules.py:80) which mismatches Swin-B's 1024-dim features
    (SURVEY §2.4); the head here is sized to the real feature dim."""

    config: Config
    dtype: Any = jnp.float32

    def setup(self):
        from gdl_tpu.models.fusion import ConcatFusionSwin
        from gdl_tpu.models.swin import SwinTransformer

        cfg = self.config
        pe = bool(cfg.pe)
        kw = dict(img_size=cfg.swin_img_size, patch_size=cfg.swin_patch,
                  embed_dim=cfg.swin_embed_dim,
                  depths=tuple(cfg.swin_depths),
                  num_heads=tuple(cfg.swin_heads), window=cfg.swin_window,
                  use_pallas_attn=cfg.use_pallas_attn,
                  pallas_attn_eval=cfg.use_pallas_attn_eval, pe=pe,
                  fuse_qkv_gemm=cfg.fuse_qkv_gemm, fuse_mlp=cfg.fuse_mlp,
                  window_resident=cfg.swin_window_resident,
                  dtype=self.dtype)
        self.audio_net = SwinTransformer(modality="audio", **kw)
        self.visual_net = SwinTransformer(modality="visual", **kw)
        feat_dim = cfg.swin_embed_dim * 2 ** (len(cfg.swin_depths) - 1)
        self.fusion_module = ConcatFusionSwin(
            input_dim=2 * feat_dim, output_dim=cfg.n_classes,
            dtype=self.dtype)

    def __call__(self, audio, visual, train: bool = False):
        cfg = self.config
        if cfg.pe:
            a, a_mul, a_std = self.audio_net(audio, train=train)
            v_pooled, v_mul, v_std = self.visual_net(visual, train=train)
            a_feature = a_mul  # pre-pool maps for the diversity diagnostic
            v_feature = v_mul
            bt = v_pooled.shape[0]
            b = audio.shape[0]
            v = jnp.mean(v_pooled.reshape(b, bt // b, -1), axis=1)
        else:
            a_feature = self.audio_net(audio, train=train)
            v_feature = self.visual_net(visual, train=train)
            a = _pool_audio(a_feature)
            v = _pool_visual(v_feature, audio.shape[0])
            a_mul = a_std = v_mul = v_std = 0

        if train and cfg.drop:
            a, v = _modality_drop(a, v, self.make_rng("drop"))

        x_out, y_out, out = self.fusion_module(a, v)
        _, _, out_a = self.fusion_module(a, jnp.zeros_like(v))
        _, _, out_v = self.fusion_module(jnp.zeros_like(a), v)
        return (a, v, out, a_feature, v_feature,
                a_mul, a_std, v_mul, v_std, out_a, out_v)


class AVClassifierSwinDGL(nn.Module):
    """Swin-backbone DGL classifier — dual Swin-B encoders + a DGL fusion
    head, exposing the same encode / unimodal_logits / fused_logits
    protocol as AVClassifierDGL so the DGL train step and mesh harness work
    unchanged (the BASELINE "VGGSound full-scale DGL with Swin encoders"
    configuration; the reference's main_dgl.py:239-240 stubs the swin
    branch out with a bare EOFError)."""

    config: Config
    dtype: Any = jnp.float32

    def setup(self):
        from gdl_tpu.models.swin import SwinTransformer

        cfg = self.config
        kw = dict(img_size=cfg.swin_img_size, patch_size=cfg.swin_patch,
                  embed_dim=cfg.swin_embed_dim,
                  depths=tuple(cfg.swin_depths),
                  num_heads=tuple(cfg.swin_heads), window=cfg.swin_window,
                  use_pallas_attn=cfg.use_pallas_attn,
                  pallas_attn_eval=cfg.use_pallas_attn_eval,
                  fuse_qkv_gemm=cfg.fuse_qkv_gemm, fuse_mlp=cfg.fuse_mlp,
                  window_resident=cfg.swin_window_resident,
                  dtype=self.dtype)
        self.audio_net = SwinTransformer(modality="audio", **kw)
        self.visual_net = SwinTransformer(modality="visual", **kw)
        feat_dim = cfg.swin_embed_dim * 2 ** (len(cfg.swin_depths) - 1)
        self.fusion_module = make_fusion(
            cfg.fusion_method, cfg.n_classes, dgl=True, input_dim=feat_dim,
            dtype=self.dtype)

    def encode(self, audio, visual, train: bool = False):
        a_map = self.audio_net(audio, train=train)
        v_map = self.visual_net(visual, train=train)
        return _pool_audio(a_map), _pool_visual(v_map, audio.shape[0])

    def unimodal_logits(self, a, v):
        return self.fusion_module.unimodal(a, v)

    def fused_logits(self, a, v):
        return self.fusion_module.fuse(a, v)

    def __call__(self, audio, visual, train: bool = False):
        a, v = self.encode(audio, visual, train=train)
        a_out, v_out, out = self.fusion_module(a, v)
        return out, a_out, v_out
