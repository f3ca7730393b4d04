"""Numerical Swin parity vs an INDEPENDENT torch oracle.

The window-attention math, relative-position recipe, and shift masks are
unit-tested against torch constructions, but until now no test ran a full
multi-stage Swin forward against an independent implementation. This one
uses `transformers.SwinModel` (HF's faithful port of the Microsoft
Swin the reference vendors — /root/reference/models/swin_transformer.py)
as the oracle: our params are exported through the Microsoft-layout
name map (utils/torch_interop.py), converted to HF's split-qkv naming,
and the two forwards must agree at fp32 tolerance on a config that
exercises every structural element: shifted blocks (stage-0 res 14,
window 7, shift 3), patch merging, the res==window shift-disable path
(stage 1), per-stage head counts, and the final LayerNorm."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _to_hf_state_dict(ms_sd):
    """Microsoft swin_transformer names -> transformers.SwinModel names.

    qkv weight [3C, C] / bias [3C] split row-wise into query/key/value
    (torch Linear stores [out, in]; Microsoft packs rows as [q; k; v])."""
    import torch

    out = {}
    for key, val in ms_sd.items():
        t = torch.as_tensor(np.asarray(val))
        if key.startswith("patch_embed.proj."):
            out["embeddings.patch_embeddings.projection."
                + key.split(".")[-1]] = t
        elif key.startswith("patch_embed.norm."):
            out["embeddings.norm." + key.split(".")[-1]] = t
        elif key in ("norm.weight", "norm.bias"):
            out["layernorm." + key.split(".")[-1]] = t
        elif ".downsample." in key:
            out["encoder." + key] = t
        elif ".attn.qkv." in key:
            c = t.shape[0] // 3
            block, kind = key.split(".attn.qkv.")  # prefix, weight|bias
            for i, name in enumerate(("query", "key", "value")):
                out[f"encoder.{block}.attention.self.{name}.{kind}"] = \
                    t[i * c:(i + 1) * c]
        elif ".attn.proj." in key:
            out["encoder." + key.replace(".attn.proj.",
                                         ".attention.output.dense.")] = t
        elif ".attn.relative_position_bias_table" in key:
            out["encoder." + key.replace(
                ".attn.", ".attention.self.")] = t
        elif ".norm1." in key:
            out["encoder." + key.replace(".norm1.",
                                         ".layernorm_before.")] = t
        elif ".norm2." in key:
            out["encoder." + key.replace(".norm2.",
                                         ".layernorm_after.")] = t
        elif ".mlp.fc1." in key:
            out["encoder." + key.replace(".mlp.fc1.",
                                         ".intermediate.dense.")] = t
        elif ".mlp.fc2." in key:
            out["encoder." + key.replace(".mlp.fc2.",
                                         ".output.dense.")] = t
        else:
            raise AssertionError(f"unmapped Microsoft key: {key}")
    return out


def _run_parity(img_size, embed_dim, depths, num_heads, batch, seed,
                rtol, atol):
    import torch
    from transformers import SwinConfig, SwinModel

    from gdl_tpu.models.swin import SwinTransformer
    from gdl_tpu.utils.torch_interop import flax_to_torch_state_dict

    model = SwinTransformer(
        modality="visual", img_size=img_size, patch_size=4,
        embed_dim=embed_dim, depths=depths, num_heads=num_heads,
        window=7, drop_path_rate=0.0)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, 1, img_size, img_size, 3)) \
        .astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(3)},
                           jnp.asarray(x), train=False)
    feat = model.apply(variables, jnp.asarray(x), train=False)
    res = img_size // 4 // 2 ** (len(depths) - 1)
    dim = embed_dim * 2 ** (len(depths) - 1)
    feat = np.asarray(feat).reshape(batch, res * res, dim)

    ms_sd = flax_to_torch_state_dict(variables["params"],
                                     variables.get("batch_stats", {}),
                                     prefix="")
    hf_sd = _to_hf_state_dict(ms_sd)

    cfg = SwinConfig(
        image_size=img_size, patch_size=4, num_channels=3,
        embed_dim=embed_dim, depths=list(depths),
        num_heads=list(num_heads), window_size=7, mlp_ratio=4.0,
        qkv_bias=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        hidden_act="gelu", use_absolute_embeddings=False)
    oracle = SwinModel(cfg, add_pooling_layer=False).eval()
    missing, unexpected = oracle.load_state_dict(hf_sd, strict=False)
    # only the relative_position_index buffers (recomputed by HF) may be
    # absent from our export; nothing we exported may be dropped
    assert not unexpected, unexpected
    assert all("relative_position_index" in k for k in missing), missing

    with torch.no_grad():
        ref = oracle(
            torch.as_tensor(x[:, 0].transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    np.testing.assert_allclose(feat, ref, rtol=rtol, atol=atol)
    return float(np.abs(feat - ref).max())


def test_swin_forward_matches_transformers_swinmodel():
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    _run_parity(img_size=56, embed_dim=16, depths=(2, 2),
                num_heads=(2, 4), batch=2, seed=0, rtol=1e-4, atol=2e-5)


def test_swin_b_full_width_matches_transformers_swinmodel():
    """FULL Swin-B (embed 128, depths [2,2,18,2], 88 M params, 224 input
    — the exact encoder the swin drivers train; reference ctor
    swin_transformer.py modality variant) vs transformers.SwinModel.
    Eager apply (no jit) keeps this ~40 s on the 1-core host; width-
    dependent divergence (bias-table sizes, 18-block stage-2 depth,
    4-stage merging chain) is what the tiny config above can't see."""
    pytest.importorskip("torch")
    pytest.importorskip("transformers")
    max_dev = _run_parity(img_size=224, embed_dim=128,
                          depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                          batch=1, seed=1, rtol=1e-3, atol=1e-4)
    # record the envelope: 24 fp32 blocks deep, expect O(1e-4)
    assert max_dev < 5e-3, max_dev


def test_swin_gradients_match_transformers_swinmodel():
    """End-to-end GRADIENT parity of the tiny 2-stage Swin against the
    independent HF oracle: d(sum sin(features))/d(input) and a probe of
    parameter gradients (patch-embed kernel + a stage-1 qkv + the bias
    table feeding the shifted block) must agree at fp32 tolerance —
    covering the backward through shifted-window masking, patch merging,
    and the relative-position gather, which no torch-construction unit
    test exercises end to end."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import SwinConfig, SwinModel

    from gdl_tpu.models.swin import SwinTransformer
    from gdl_tpu.utils.torch_interop import flax_to_torch_state_dict

    model = SwinTransformer(
        modality="visual", img_size=56, patch_size=4, embed_dim=16,
        depths=(2, 2), num_heads=(2, 4), window=7, drop_path_rate=0.0)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 1, 56, 56, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(5)},
                           jnp.asarray(x), train=False)

    def loss_fn(params, xin):
        feat = model.apply({"params": params}, xin, train=False)
        return jnp.sum(jnp.sin(feat))

    (g_params, g_x) = jax.grad(loss_fn, argnums=(0, 1))(
        variables["params"], jnp.asarray(x))

    hf_sd = _to_hf_state_dict(flax_to_torch_state_dict(
        variables["params"], {}, prefix=""))
    cfg = SwinConfig(
        image_size=56, patch_size=4, num_channels=3, embed_dim=16,
        depths=[2, 2], num_heads=[2, 4], window_size=7, mlp_ratio=4.0,
        qkv_bias=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        hidden_act="gelu", use_absolute_embeddings=False)
    oracle = SwinModel(cfg, add_pooling_layer=False).eval()
    oracle.load_state_dict(hf_sd, strict=False)

    xt = torch.as_tensor(x[:, 0].transpose(0, 3, 1, 2),
                         dtype=torch.float32).requires_grad_(True)
    torch.sin(oracle(xt).last_hidden_state).sum().backward()

    np.testing.assert_allclose(
        np.asarray(g_x)[:, 0], xt.grad.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5)

    named = dict(oracle.named_parameters())
    probes = [
        (g_params["patch_embed"]["proj"]["kernel"],
         named["embeddings.patch_embeddings.projection.weight"]
         .grad.numpy().transpose(2, 3, 1, 0)),
        # qkv kernel [C, 3C] vs HF query/key/value [C', C] each
        (np.asarray(g_params["stage0_block1"]["attn"]["qkv"]["kernel"]),
         np.concatenate([
             named[f"encoder.layers.0.blocks.1.attention.self."
                   f"{n}.weight"].grad.numpy()
             for n in ("query", "key", "value")], axis=0).T),
        (g_params["stage0_block1"]["attn"]["relative_position_bias_table"],
         named["encoder.layers.0.blocks.1.attention.self."
               "relative_position_bias_table"].grad.numpy()),
    ]
    for got, ref in probes:
        np.testing.assert_allclose(np.asarray(got), ref,
                                   rtol=2e-4, atol=1e-5)
