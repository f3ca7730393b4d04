"""End-to-end numeric parity: the full AVClassifierDGL forward (dual
encoders → pooling → DGL fusion) against a torch oracle assembled from
independently-written pieces with copied weights — any wiring deviation
(fold order, pooling, concat order, detach placement) shows up here."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from gdl_tpu.config import Config
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.models import fusion as F
from tests.test_resnet_parity import TorchEncoder, copy_flax_to_torch

STAGES = (1, 1, 1, 1)
WIDTH = 8


def dense_to_torch(p):
    lin = tnn.Linear(p["kernel"].shape[0], p["kernel"].shape[1])
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(p["kernel"]).T.copy()))
        lin.bias.copy_(torch.from_numpy(np.asarray(p["bias"]).copy()))
    return lin.eval()


def test_full_dgl_classifier_matches_torch_oracle():
    cfg = Config(dataset="CREMAD", fusion_method="concat", fps=2,
                 encoder_width=WIDTH, encoder_stages=list(STAGES))
    model = AVClassifierDGL(config=cfg)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 64, 48, 1)).astype(np.float32)
    visual = rng.standard_normal((2, 2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(audio),
                           jnp.asarray(visual), train=False)
    out, out_a, out_v = model.apply(variables, jnp.asarray(audio),
                                    jnp.asarray(visual), train=False)

    # --- torch oracle ---
    p = variables["params"]
    ta = TorchEncoder(1, WIDTH, STAGES).eval()
    copy_flax_to_torch(p["audio_net"], ta, STAGES)
    tv = TorchEncoder(3, WIDTH, STAGES).eval()
    copy_flax_to_torch(p["visual_net"], tv, STAGES)
    fc_out = dense_to_torch(p["fusion_module"]["fc_out"])

    with torch.no_grad():
        a_map = ta(torch.from_numpy(audio.transpose(0, 3, 1, 2)))
        # visual: fold T into batch like backbone.py:160-164
        v_in = torch.from_numpy(
            visual.reshape(4, 64, 64, 3).transpose(0, 3, 1, 2).copy())
        v_map = tv(v_in)
        a_feat = a_map.mean(dim=(2, 3))                      # [2, C]
        v_feat = v_map.mean(dim=(2, 3)).reshape(2, 2, -1).mean(1)
        cat = torch.cat([a_feat, v_feat], dim=1)
        ref_out = fc_out(cat)
        zeros = torch.zeros_like(a_feat)
        ref_a = fc_out(torch.cat([a_feat, zeros], dim=1))
        ref_v = fc_out(torch.cat([zeros, v_feat], dim=1))

    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_a), ref_a.numpy(),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(out_v), ref_v.numpy(),
                               rtol=5e-3, atol=5e-4)


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


def test_gated_fusion_forward_matches_torch():
    fusion = F.GatedFusionDGL(input_dim=16, dim=16, output_dim=5)
    x, y = _rand((3, 16), 1), _rand((3, 16), 2)
    v = fusion.init(jax.random.PRNGKey(0), x, y)
    out_x, out_y, out = fusion.apply(v, x, y)

    fc_x = dense_to_torch(v["params"]["fc_x"])
    fc_y = dense_to_torch(v["params"]["fc_y"])
    fc_out = dense_to_torch(v["params"]["fc_out"])
    tx = torch.from_numpy(np.asarray(x))
    ty = torch.from_numpy(np.asarray(y))
    with torch.no_grad():
        ox, oy = fc_x(tx), fc_y(ty)
        ref_fused = fc_out(torch.sigmoid(ox) * oy)  # x_gate=True (:239-241)
        ref_x = fc_out(torch.sigmoid(ox) * ox)
        ref_y = fc_out(torch.sigmoid(oy) * oy)
    np.testing.assert_allclose(np.asarray(out), ref_fused.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_x), ref_x.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_y), ref_y.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_film_fusion_forward_matches_torch():
    fusion = F.FiLMDGL(input_dim=8, dim=8, output_dim=5)
    x, y = _rand((3, 8), 3), _rand((3, 8), 4)
    v = fusion.init(jax.random.PRNGKey(0), x, y)
    z_x, z_y, out = fusion.apply(v, x, y)

    fc = dense_to_torch(v["params"]["fc"])
    fc_out = dense_to_torch(v["params"]["fc_out"])
    tx = torch.from_numpy(np.asarray(x)).unsqueeze(2)  # [B, D, 1]
    ty = torch.from_numpy(np.asarray(y)).unsqueeze(1)  # [B, 1, D]
    with torch.no_grad():
        ref_out = fc_out(fc(torch.bmm(tx, ty).reshape(3, -1)))
        ref_zx = fc_out(fc(torch.bmm(tx, tx.transpose(2, 1)).reshape(3, -1)))
        ref_zy = fc_out(fc(torch.bmm(ty.transpose(2, 1), ty).reshape(3, -1)))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_x), ref_zx.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_y), ref_zy.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_sum_fusion_forward_matches_torch():
    fusion = F.SumFusionDGL(input_dim=8, output_dim=5)
    x, y = _rand((3, 8), 5), _rand((3, 8), 6)
    v = fusion.init(jax.random.PRNGKey(0), x, y)
    out_x, out_y, out = fusion.apply(v, x, y)
    fc_x = dense_to_torch(v["params"]["fc_x"])
    fc_y = dense_to_torch(v["params"]["fc_y"])
    with torch.no_grad():
        ref_x = fc_x(torch.from_numpy(np.asarray(x)))
        ref_y = fc_y(torch.from_numpy(np.asarray(y)))
    np.testing.assert_allclose(np.asarray(out_x), ref_x.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), (ref_x + ref_y).numpy(),
                               rtol=1e-4, atol=1e-5)
