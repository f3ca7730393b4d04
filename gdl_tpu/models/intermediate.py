"""Intermediate-fusion model family (SURVEY §2.6): MMTM, SE-fusion, and the
mmformer pair. These define the MMTM / SE-fusion / mmformer capabilities
named in BASELINE.json; in the reference they are built but reachable only
by code edit, and several are shape-broken as shipped (layer3 input-width
mismatches — resnet18_se.py:159; the missing `layer3_new` —
surf_mmfomer.py:80; SURF_Fomer's missing 2x2 avg before tokenization).
Here every net is well-formed; the reference's structure and math are kept.

All image-like tensors are NHWC; audio spectrograms enter as [B, F, T, 1]
and the AV adapter (mmtm_net.py:381-387) converts them to a 3-channel 224²
'rgb' stream.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdl_tpu.models.classifier import PEHead
from gdl_tpu.models.layers import batch_norm, dense_xavier_init
from gdl_tpu.models.se_resnet import SEStem, SETrunk
from gdl_tpu.models.transformer import (
    LearnedPositionalEncoding,
    MMTransformerModel,
    modality_drop,
    unbalance_modality_drop,
)

AV_DATASETS = ("AVE", "CREMAD", "KineticSound")


def av_adapt(spec: jnp.ndarray, frames: jnp.ndarray):
    """The audio-visual input adapter (mmtm_net.py:381-387): spectrogram
    [B, F, T, 1] → 3-channel 224² image; frames [B, 1, H, W, 3] → squeeze
    the single time step."""
    rgb = jnp.repeat(spec, 3, axis=-1)
    rgb = jax.image.resize(rgb, (rgb.shape[0], 224, 224, 3), "bilinear")
    depth = jnp.squeeze(frames, axis=1)
    return rgb, depth


class MMTM(nn.Module):
    """Multimodal squeeze-excite recalibration (mmtm_net.py:236-276):
    global-average both streams, joint squeeze fc, per-stream excitation
    gates."""

    dim_a: int
    dim_b: int
    ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        dim_out = int(2 * (self.dim_a + self.dim_b) / self.ratio)
        squeeze = jnp.concatenate(
            [jnp.mean(a, axis=(1, 2)), jnp.mean(b, axis=(1, 2))], axis=-1)
        e = nn.Dense(dim_out, dtype=self.dtype, kernel_init=dense_xavier_init,
                     name="fc_squeeze")(squeeze)
        e = nn.relu(e)
        ga = nn.sigmoid(nn.Dense(self.dim_a, dtype=self.dtype,
                                 kernel_init=dense_xavier_init,
                                 name="fc_a")(e))
        gb = nn.sigmoid(nn.Dense(self.dim_b, dtype=self.dtype,
                                 kernel_init=dense_xavier_init,
                                 name="fc_b")(e))
        return a * ga[:, None, None, :], b * gb[:, None, None, :]


class MMTMNet(nn.Module):
    """MMTM_Net (mmtm_net.py:318-407): two SE-less stems, MMTM gates at the
    layer2/3/4 boundaries, a TRUNK WHOSE LAYER3/LAYER4 WEIGHTS ARE SHARED
    between the two streams (the reference assigns model_1's layers to both
    streams, mmtm_net.py:341-344 — kept), concat + fc head. DGL-style
    outputs: (out, out_rgb, out_depth) where the unimodal logits zero the
    other stream through the same fusion path (:399-406). NOTE: despite the
    `x_rgb_detach` name the reference does NOT detach the fused path here
    (:391-393) — kept live."""

    num_classes: int
    width: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        w = self.width
        self.stem_rgb = SEStem(use_se=False, width=w, dtype=self.dtype)
        self.stem_depth = SEStem(use_se=False, width=w, dtype=self.dtype)
        self.mmtm0 = MMTM(2 * w, 2 * w, 2, self.dtype)
        self.mmtm1 = MMTM(4 * w, 4 * w, 2, self.dtype)
        self.mmtm2 = MMTM(8 * w, 8 * w, 2, self.dtype)
        # shared per-stream trunk stages (weight sharing — see docstring)
        from gdl_tpu.models.resnet import BasicBlock

        self.layer3 = [BasicBlock(filters=4 * w, stride=2 if i == 0 else 1,
                                  dtype=self.dtype, name=f"layer3_{i}")
                       for i in range(2)]
        self.layer4 = [BasicBlock(filters=8 * w, stride=2 if i == 0 else 1,
                                  dtype=self.dtype, name=f"layer4_{i}")
                       for i in range(2)]
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype,
                           kernel_init=dense_xavier_init,
                           bias_init=nn.initializers.zeros, name="fc")

    def fusion(self, x_rgb, x_depth, train: bool = False):
        """The reference order (mmtm_net.py:355-377): mmtm0 → layer3 →
        mmtm1 → layer4 → mmtm2 → pool → concat."""
        x_rgb, x_depth = self.mmtm0(x_rgb, x_depth)
        for blk in self.layer3:
            x_rgb = blk(x_rgb, train)
            x_depth = blk(x_depth, train)
        x_rgb, x_depth = self.mmtm1(x_rgb, x_depth)
        for blk in self.layer4:
            x_rgb = blk(x_rgb, train)
            x_depth = blk(x_depth, train)
        x_rgb, x_depth = self.mmtm2(x_rgb, x_depth)
        return jnp.concatenate([jnp.mean(x_rgb, axis=(1, 2)),
                                jnp.mean(x_depth, axis=(1, 2))], axis=-1)

    def __call__(self, spec, frames, train: bool = False,
                 av_inputs: bool = True):
        if av_inputs:
            rgb, depth = av_adapt(spec, frames)
        else:
            rgb, depth = spec, frames
        x_rgb = self.stem_rgb(rgb, train)
        x_depth = self.stem_depth(depth, train)

        out = self.fc(self.fusion(x_rgb, x_depth, train))
        out_rgb = self.fc(self.fusion(
            x_rgb, jnp.zeros_like(x_depth), train))
        out_depth = self.fc(self.fusion(
            jnp.zeros_like(x_rgb), x_depth, train))
        return out, out_rgb, out_depth


class SEFusionNet(nn.Module):
    """SURF_Multi (sefusion.py:20-63): two SE stems, channel concat, shared
    (layer3, layer4, pool, fc) trunk → logits."""

    num_classes: int
    width: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.stem_rgb = SEStem(use_se=True, width=self.width,
                               dtype=self.dtype)
        self.stem_depth = SEStem(use_se=True, width=self.width,
                                 dtype=self.dtype)
        self.trunk = SETrunk(self.num_classes, self.width, self.dtype)

    def __call__(self, rgb, depth, train: bool = False,
                 av_inputs: bool = False):
        if av_inputs:  # (spectrogram, frames) → two image streams
            rgb, depth = av_adapt(rgb, depth)
        x = jnp.concatenate([self.stem_rgb(rgb, train),
                             self.stem_depth(depth, train)], axis=-1)
        return self.trunk(x, train)


class _TokenProject(nn.Module):
    """BN + LeakyReLU + 3x3 conv to the embedding dim, then flatten to
    tokens (surf_mmfomer.py:99-102, :285-291)."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = batch_norm(train, self.dtype, name="bn")(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(self.embed_dim, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="proj")(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c), (h, w)


class MMFormer(nn.Module):
    """SURF_Fomer (surf_mmfomer.py:14-167): 3-modality mmformer — SE stems,
    modality-dropout augmentation, per-modality BN+LeakyReLU+conv
    tokenization, learned positional encoding + intra-modality transformer,
    conv restore, channel concat, shared SE trunk. Returns
    (logits, layer3, layer4).

    Shipped-reference defects fixed to make the net well-formed: the 2x2
    avg pool before tokenization (present in SURF_Fomer_N, missing here →
    784 tokens vs the 196-token positional encoding) and the trunk input
    width (`layer3_new` never exists; the 3-modality concat is 3·128)."""

    num_classes: int
    embed_dim: int = 512
    width: int = 64
    seq_len: int = 196  # tokens after the stem at 224² input (14·14)
    drop_mode: str = "average"  # 'average' | 'unbalance'
    dtype: Any = jnp.float32
    use_pallas: bool = True  # eval-kernel gate threaded to the attention
    # modules (gdl_tpu/serve.py sets False for cpu-containing exports)

    def setup(self):
        w = self.width
        self.stems = [SEStem(use_se=True, use_avg=True, width=w,
                             dtype=self.dtype, name=f"stem{i}")
                      for i in range(3)]
        self.projects = [_TokenProject(self.embed_dim, self.dtype,
                                       name=f"project{i}")
                         for i in range(3)]
        self.pos_enc = [LearnedPositionalEncoding(self.seq_len,
                                                  self.embed_dim,
                                                  name=f"pe{i}")
                        for i in range(3)]
        self.intra = [MMTransformerModel(modal_num=3, dim=self.embed_dim,
                                         depth=1, heads=8, mlp_dim=4096,
                                         dtype=self.dtype,
                                         use_pallas=self.use_pallas,
                                         name=f"intra{i}")
                      for i in range(3)]
        self.restores = [nn.Conv(2 * w, (3, 3), padding=[(1, 1), (1, 1)],
                                 dtype=self.dtype, name=f"restore{i}")
                         for i in range(3)]
        self.trunk = SETrunk(self.num_classes, self.width, self.dtype)

    def __call__(self, rgb, ir, depth, train: bool = False,
                 epoch: int = 0,
                 drop_p: Optional[tuple] = None):
        xs = [stem(x, train) for stem, x in
              zip(self.stems, (rgb, ir, depth))]
        if train:
            rng = self.make_rng("drop")
            if self.drop_mode == "average":
                xs, _ = modality_drop(xs, rng, drop_p)
            else:
                xs, _ = unbalance_modality_drop(xs, rng, epoch, drop_p)
        outs = []
        for i in range(3):
            tokens, (h, w) = self.projects[i](xs[i], train)
            tokens = self.pos_enc[i](tokens)
            tokens = self.intra[i](tokens, train)
            fmap = tokens.reshape(tokens.shape[0], h, w, self.embed_dim)
            outs.append(self.restores[i](fmap))
        x = jnp.concatenate(outs, axis=-1)
        return self.trunk(x, train, return_maps=True)


class MMFormerN(nn.Module):
    """SURF_Fomer_N (surf_mmfomer.py:170-356): 2-modality variant — SE-less
    stems + 2x2 avg, estimate_mean_std PE heads (== PEHead; mmtm_net.py:
    279-315), intra- then inter-modality transformers, Conv1d token fusion
    (392→196 tokens), pooled fc. Returns the reference 7-tuple
    (x_f, mu_rgb, std_rgb, mu_depth, std_depth, x_r, x_i) where x_r/x_i
    zero the other stream through the shared fusion (surf_mmfomer.py:
    337-351)."""

    num_classes: int
    embed_dim: int = 512
    width: int = 64
    seq_len: int = 196
    dtype: Any = jnp.float32
    use_pallas: bool = True  # eval-kernel gate threaded to the attention
    # modules (gdl_tpu/serve.py sets False for cpu-containing exports)
    share_streams: bool = False  # perf mode (+15% step throughput):
    # compute each modality's project->PE->intra token stream ONCE and
    # reuse it across the fused and unimodal fusion passes (the live
    # x_rgb stream is identical between the x_f and x_r calls, and x_ir
    # between x_f and x_i — 6 intra stacks become 4). The CLASS default
    # stays the reference's structure: its three fusion_function calls
    # draw INDEPENDENT dropout masks per pass and update the projection
    # BNs' running stats three times (surf_mmfomer.py:337-351); sharing
    # keeps every gradient unbiased (each pass's marginal distribution
    # is unchanged) but correlates the gradient noise across passes and
    # halves the BN running-stat update count. Eval forwards are
    # bit-identical either way (tests/test_intermediate.py), and the
    # round-4 convergence A/B measured the mode accuracy-neutral
    # (tools/share_streams_ab.py; benchmarks/RESULTS.md), so the DRIVER
    # (main_intermediate.py) defaults it ON unless --strict_compat.
    batched_inter: bool = False  # run the three fusion passes' INTER half
    # (pe -> inter transformer -> token fuse -> pool -> fc) as ONE call
    # over the batch-concatenated [3B, 392, C] token streams. The inter
    # half is BN-free (LayerNorm + attention + MLP + dropout, all
    # row-wise), so eval outputs are bit-identical to three separate
    # passes (measured exact on TPU; CPU oneDNN GEMMs reassociate at
    # ~1e-7) and train keeps the reference's dropout DISTRIBUTION (one
    # [3B,...] mask draw == three independent [B,...] draws row-for-row);
    # only the RNG stream assignment differs — same class of change as
    # cfg.fast_dropout_rng. The BN-bearing intra/projection calls stay
    # separate and keep the reference's exact call order. MEASURED A WASH
    # on v5e bs64 bf16 (96.0 vs 95.5 ms/step — the inter GEMMs are
    # already MXU-saturated at B=64; RESULTS.md round-3), so the default
    # stays the reference's three-pass structure.

    def setup(self):
        w = self.width
        self.stem_rgb = SEStem(use_se=False, use_avg=True, width=w,
                               dtype=self.dtype)
        self.stem_ir = SEStem(use_se=False, use_avg=True, width=w,
                              dtype=self.dtype)
        self.rgb_p = PEHead(2 * w, self.dtype)
        self.depth_p = PEHead(2 * w, self.dtype)
        self.projects = [_TokenProject(self.embed_dim, self.dtype,
                                       name=f"project{i}") for i in range(2)]
        self.pos_enc = [LearnedPositionalEncoding(self.seq_len,
                                                  self.embed_dim,
                                                  name=f"pe{i}")
                        for i in range(2)]
        self.intra = [MMTransformerModel(modal_num=2, dim=self.embed_dim,
                                         depth=1, heads=8, mlp_dim=4096,
                                         dtype=self.dtype,
                                         use_pallas=self.use_pallas,
                                         name=f"intra{i}")
                      for i in range(2)]
        self.inter_pe = LearnedPositionalEncoding(2 * self.seq_len,
                                                   self.embed_dim,
                                                   name="inter_pe")
        self.inter = MMTransformerModel(modal_num=2, dim=self.embed_dim,
                                        depth=1, heads=8, mlp_dim=4096,
                                        dtype=self.dtype,
                                        use_pallas=self.use_pallas,
                                        name="inter")
        # Conv1d(392, 196, k1) over tokens == a dense mixing of the token
        # axis; kernel [392, 196] applied to [B, 392, C] on the token dim
        self.token_fuse = self.param("token_fuse", dense_xavier_init,
                                     (2 * self.seq_len, self.seq_len))
        self.token_fuse_bias = self.param("token_fuse_bias",
                                          nn.initializers.zeros,
                                          (self.seq_len,))
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype,
                           kernel_init=dense_xavier_init,
                           bias_init=nn.initializers.zeros, name="fc")

    def _intra_stream(self, i: int, x, train: bool):
        """project -> positional encoding -> intra transformer for one
        modality (the per-modality half of fusion_function)."""
        t, _ = self.projects[i](x, train)
        t = self.pos_enc[i](t)
        return self.intra[i](t, train)

    def _inter_tail(self, x, train: bool):
        """PE -> inter transformer -> Conv1d token fuse -> pool on an
        already seq-concatenated [B', 2·seq_len, C] stream (the cross-
        modal half of fusion_function, surf_mmfomer.py:300-316). BN-free:
        every op is row-wise, so batching fusion passes along B' is
        exact."""
        x = self.inter_pe(x)
        x = self.inter(x, train)
        x = jnp.einsum("bnc,nm->bmc", x,
                       self.token_fuse.astype(x.dtype)) + \
            self.token_fuse_bias[None, :, None].astype(x.dtype)
        return jnp.mean(x, axis=1)  # pooled [B', C]

    def _inter_fuse(self, tokens, train: bool):
        return self._inter_tail(jnp.concatenate(tokens, axis=1), train)

    def fusion_function(self, x_rgb, x_ir, train: bool = False):
        return self._inter_fuse([self._intra_stream(0, x_rgb, train),
                                 self._intra_stream(1, x_ir, train)],
                                train)

    def __call__(self, spec, frames, train: bool = False,
                 av_inputs: bool = True):
        if av_inputs:
            rgb, ir = av_adapt(spec, frames)
        else:
            rgb, ir = spec, frames
        x_rgb = self.stem_rgb(rgb, train)
        x_ir = self.stem_ir(ir, train)
        x_rgb, mu_rgb, std_rgb = self.rgb_p(x_rgb, train)
        x_ir, mu_depth, std_depth = self.depth_p(x_ir, train)

        if self.share_streams:
            t_rgb = self._intra_stream(0, x_rgb, train)
            t_ir = self._intra_stream(1, x_ir, train)
            t_rgb0 = self._intra_stream(0, jnp.zeros_like(x_rgb), train)
            t_ir0 = self._intra_stream(1, jnp.zeros_like(x_ir), train)
            pairs = [(t_rgb, t_ir), (t_rgb, t_ir0), (t_rgb0, t_ir)]
        else:
            # the 6 BN-bearing intra calls keep the reference's exact
            # per-module input sequence (f, r, i passes in order), so
            # running-stat updates compound identically
            pairs = [
                (self._intra_stream(0, x_rgb, train),
                 self._intra_stream(1, x_ir, train)),
                (self._intra_stream(0, x_rgb, train),
                 self._intra_stream(1, jnp.zeros_like(x_ir), train)),
                (self._intra_stream(0, jnp.zeros_like(x_rgb), train),
                 self._intra_stream(1, x_ir, train)),
            ]
        seqs = [jnp.concatenate(p, axis=1) for p in pairs]
        if self.batched_inter:
            out = self.fc(self._inter_tail(jnp.concatenate(seqs, axis=0),
                                           train))
            x_f, x_r, x_i = jnp.split(out, 3, axis=0)
        else:
            x_f, x_r, x_i = (self.fc(self._inter_tail(s, train))
                             for s in seqs)
        return x_f, mu_rgb, std_rgb, mu_depth, std_depth, x_r, x_i


def build_intermediate(name: str, n_classes: int, width: int = 64,
                       dtype: Any = jnp.float32,
                       share_streams: bool = False,
                       batched_inter: bool = False,
                       use_pallas: bool = True,
                       **model_kwargs):
    """Model factory for the intermediate family. Returns (model, kind)
    where `kind` names the eval-output contract: 'triple' = MMTM's
    (out, out_a, out_v) (mmtm_net.py:388-400), 'single' = SE-fusion's one
    logits array (sefusion.py:52-63), 'seven' = SURF_Fomer_N's 7-tuple
    (surf_mmfomer.py:337-356). Shared by the main_intermediate.py driver
    and the serving exporter (gdl_tpu/serve.py)."""
    if name == "mmtm":
        return MMTMNet(num_classes=n_classes, width=width, dtype=dtype,
                       **model_kwargs), "triple"
    if name == "sefusion":
        return SEFusionNet(num_classes=n_classes, width=width, dtype=dtype,
                           **model_kwargs), "single"
    if name == "mmformer_n":
        return MMFormerN(num_classes=n_classes, width=width, dtype=dtype,
                         share_streams=share_streams,
                         batched_inter=batched_inter,
                         use_pallas=use_pallas,
                         **model_kwargs), "seven"
    raise NotImplementedError("unknown intermediate model: " + name)
