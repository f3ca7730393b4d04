"""ResNet encoder parity against an independent PyTorch oracle.

The oracle below is written from the torchvision ResNet recipe (the
reference's backbone.py is itself a torchvision copy) — NOT imported from
the reference — and weights are copied Flax→torch, so any wiring mistake
(stride placement, padding, BN eps, downsample branch) shows up as a
numeric mismatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from gdl_tpu.models.resnet import resnet18


class TorchBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TorchEncoder(tnn.Module):
    def __init__(self, in_ch, width, stages):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, width, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.pool = tnn.MaxPool2d(3, 2, 1)
        blocks = []
        cin = width
        for s, n in enumerate(stages):
            cout = width * (2 ** s)
            for b in range(n):
                blocks.append(TorchBlock(cin, cout,
                                         2 if (s > 0 and b == 0) else 1))
                cin = cout
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.pool(x)
        return self.blocks(x)


def copy_flax_to_torch(params, tmodel, stages):
    def conv_w(p):
        return torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))

    sd = {}
    sd["conv1.weight"] = conv_w(params["conv1"])
    sd["bn1.weight"] = torch.from_numpy(np.asarray(params["bn1"]["scale"]))
    sd["bn1.bias"] = torch.from_numpy(np.asarray(params["bn1"]["bias"]))
    sd["bn1.running_mean"] = torch.zeros_like(sd["bn1.bias"])
    sd["bn1.running_var"] = torch.ones_like(sd["bn1.bias"])
    i = 0
    for s, n in enumerate(stages):
        for b in range(n):
            fp = params[f"layer{s + 1}_{b}"]
            pre = f"blocks.{i}."
            sd[pre + "conv1.weight"] = conv_w(fp["conv1"])
            sd[pre + "conv2.weight"] = conv_w(fp["conv2"])
            for bn in ("bn1", "bn2"):
                sd[pre + bn + ".weight"] = torch.from_numpy(
                    np.asarray(fp[bn]["scale"]))
                sd[pre + bn + ".bias"] = torch.from_numpy(
                    np.asarray(fp[bn]["bias"]))
                sd[pre + bn + ".running_mean"] = torch.zeros_like(
                    sd[pre + bn + ".bias"])
                sd[pre + bn + ".running_var"] = torch.ones_like(
                    sd[pre + bn + ".bias"])
            if "downsample_conv" in fp:
                sd[pre + "down.0.weight"] = conv_w(fp["downsample_conv"])
                sd[pre + "down.1.weight"] = torch.from_numpy(
                    np.asarray(fp["downsample_bn"]["scale"]))
                sd[pre + "down.1.bias"] = torch.from_numpy(
                    np.asarray(fp["downsample_bn"]["bias"]))
                sd[pre + "down.1.running_mean"] = torch.zeros_like(
                    sd[pre + "down.1.bias"])
                sd[pre + "down.1.running_var"] = torch.ones_like(
                    sd[pre + "down.1.bias"])
            i += 1
    tmodel.load_state_dict(sd)


def test_audio_encoder_matches_torch_oracle():
    stages = (1, 1, 1, 1)
    width = 8
    model = resnet18("audio", width=width, stage_sizes=stages)
    x = np.random.default_rng(0).standard_normal((2, 64, 48, 1)).astype(
        np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    tmodel = TorchEncoder(1, width, stages).eval()
    copy_flax_to_torch(variables["params"], tmodel, stages)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    assert ours.shape == ref.shape  # [2, 2, 2, 64]
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_visual_encoder_folds_time_into_batch():
    """[B, T, H, W, 3] → [B*T, h, w, C] (backbone.py:160-164 contract)."""
    model = resnet18("visual", width=8, stage_sizes=(1, 1, 1, 1))
    x = jnp.ones((2, 3, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (6, 2, 2, 64)


def test_encoder_output_dim_512_at_reference_width():
    """Reference channel progression 64→512 (backbone.py:107-113) — checked
    via param shapes only (no forward; full-width forward is slow on this
    1-core host)."""
    model = resnet18("audio")
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.ones((1, 257, 188, 1)),
                           train=False))
    p = shapes["params"]
    assert p["conv1"]["kernel"].shape == (7, 7, 1, 64)
    assert p["layer4_1"]["conv2"]["kernel"].shape == (3, 3, 512, 512)


def test_stem_s2d_lowering_matches_plain_conv():
    """StemConv7x7s2 's2d' mode (the TPU space-to-depth lowering of the
    7x7/s2 stem) is the same linear map as the plain conv — equal to
    float-reassociation tolerance at every parity of the input dims, with
    the exact torch output size, and the param path stays conv1/kernel."""
    from gdl_tpu.models.resnet import StemConv7x7s2

    rng = np.random.RandomState(3)
    for (h, w, c) in ((257, 188, 1), (224, 224, 3), (33, 47, 3)):
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        m_conv = StemConv7x7s2(16, mode="conv")
        m_s2d = StemConv7x7s2(16, mode="s2d")
        p = m_conv.init(jax.random.PRNGKey(0), x)
        o1 = np.asarray(m_conv.apply(p, x))
        o2 = np.asarray(m_s2d.apply(p, x))
        assert o1.shape == o2.shape == (2, (h + 1) // 2, (w + 1) // 2, 16)
        np.testing.assert_allclose(o2, o1, rtol=2e-5, atol=2e-6)

    enc = resnet18("audio", width=8, stage_sizes=(1, 1, 1, 1))
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 1)),
                      train=False)["params"]
    assert params["conv1"]["kernel"].shape == (7, 7, 1, 8)
