"""Torch .pth checkpoint interop (VERDICT round-1 item 2).

A reference-shaped torch AVClassifier_DGL (reference module names:
`module.audio_net.layer1.0.conv1.weight`, `module.fusion_module.fc_out.
weight`, ...) is built as an independent oracle, torch.save-d with the
reference's checkpoint schema (main_dgl.py:349-386), imported into our
flax model, and the forward logits must match. Then the reverse: our
export must strict-load into the torch oracle and reproduce the logits.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from gdl_tpu.config import Config

WIDTH = 8
STAGES = (1, 1, 1, 1)
DIM = WIDTH * 8  # final channel count
N_CLASSES = 6


class TorchBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TorchRefResNet(tnn.Module):
    """Reference naming: layer1..layer4 Sequentials of BasicBlocks
    (backbone.py:107-113). width/stages default to the tiny test model;
    the full-width parity tests pass the flagship (64, (2, 2, 2, 2))."""

    def __init__(self, in_ch, width=WIDTH, stages=STAGES):
        super().__init__()
        self.stages = stages
        self.conv1 = tnn.Conv2d(in_ch, width, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = width
        for s, n in enumerate(stages):
            cout = width * (2 ** s)
            blocks = []
            for b in range(n):
                blocks.append(TorchBlock(cin, cout,
                                         2 if (s > 0 and b == 0) else 1))
                cin = cout
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for s in range(len(self.stages)):
            x = getattr(self, f"layer{s + 1}")(x)
        return x


class TorchConcatDGL(tnn.Module):
    """fusion_modules.py:45-59: shared fc_out + dead fc_auxi."""

    def __init__(self, dim=DIM, n_classes=N_CLASSES):
        super().__init__()
        self.fc_out = tnn.Linear(2 * dim, n_classes)
        self.fc_auxi = tnn.Linear(2 * dim, n_classes)

    def forward(self, x, y):
        out = self.fc_out(torch.cat((x, y), dim=1).detach())
        x_out = self.fc_out(torch.cat((x, torch.zeros_like(y)), dim=1))
        y_out = self.fc_out(torch.cat((torch.zeros_like(x), y), dim=1))
        return x_out, y_out, out


class TorchAVClassifierDGL(tnn.Module):
    def __init__(self, width=WIDTH, stages=STAGES, n_classes=N_CLASSES):
        super().__init__()
        dim = width * 8
        self.fusion_module = TorchConcatDGL(dim, n_classes)
        self.audio_net = TorchRefResNet(1, width, stages)
        self.visual_net = TorchRefResNet(3, width, stages)

    def forward(self, spec, image):
        a = self.audio_net(spec)
        B, C3, T, H, W = image.shape
        v = self.visual_net(image.permute(0, 2, 1, 3, 4).reshape(
            B * T, C3, H, W))
        _, C, h, w = v.shape
        v = v.view(B, T, C, h, w).permute(0, 2, 1, 3, 4)
        a = torch.flatten(tnn.functional.adaptive_avg_pool2d(a, 1), 1)
        v = torch.flatten(tnn.functional.adaptive_avg_pool3d(v, 1), 1)
        return self.fusion_module(a, v)


def _randomized_oracle(seed=0):
    torch.manual_seed(seed)
    model = TorchAVClassifierDGL().eval()
    # randomize BN running stats so the mean/var mapping is exercised
    g = torch.Generator().manual_seed(seed + 1)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(1.0 + 0.5 * torch.rand(m.running_var.shape,
                                                       generator=g))
    return model


def _flax_model_and_templates():
    import jax
    import jax.numpy as jnp

    from gdl_tpu.models.classifier import AVClassifierDGL

    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 modulation="Normal", fps=2, batch_size=2,
                 encoder_width=WIDTH, encoder_stages=list(STAGES))
    model = AVClassifierDGL(config=cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, 64, 48, 1)),
                           jnp.zeros((2, 2, 64, 64, 3)), train=False)
    return cfg, model, variables


@pytest.fixture(scope="module")
def saved_reference_ckpt(tmp_path_factory):
    """A reference-schema torch .pth with DataParallel 'module.' prefixes."""
    model = _randomized_oracle()
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    path = tmp_path_factory.mktemp("ck") / (
        "best_model_of_dataset_CREMAD_Normal_alpha_4.0optimizer_sgd_"
        "modulate_starts_0_ends_50_epoch_3_acc_0.5.pth")
    torch.save({"saved_epoch": 3, "modulation": "Normal", "alpha": 4.0,
                "fusion": "concat", "acc": 0.5, "model": sd,
                "optimizer": {}}, str(path))
    return str(path), model


def test_reference_pth_imports_and_matches_logits(saved_reference_ckpt):
    import jax.numpy as jnp

    from gdl_tpu.utils.torch_interop import (
        is_torch_checkpoint,
        load_torch_checkpoint,
        torch_state_dict_to_flax,
    )

    path, oracle = saved_reference_ckpt
    assert is_torch_checkpoint(path)

    cfg, model, variables = _flax_model_and_templates()
    loaded = load_torch_checkpoint(path, cfg)
    assert loaded["saved_epoch"] == 3
    params, stats, report = torch_state_dict_to_flax(
        loaded["model"], variables["params"], variables["batch_stats"],
        strict=True)
    assert not report["missing"] and not report["unexpected"]

    rng = np.random.default_rng(0)
    spec = rng.standard_normal((2, 64, 48, 1)).astype(np.float32)
    image = rng.standard_normal((2, 2, 64, 64, 3)).astype(np.float32)

    out, out_a, out_v = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(spec), jnp.asarray(image), train=False)

    with torch.no_grad():
        t_a, t_v, t_out = oracle(
            torch.from_numpy(spec.transpose(0, 3, 1, 2)),
            torch.from_numpy(image.transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_a), t_a.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_v), t_v.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_export_strict_loads_into_torch_and_matches(tmp_path):
    """Our save_torch_checkpoint output loads into the torch oracle with
    strict=True (num_batches_tracked included) and reproduces our logits."""
    import jax.numpy as jnp

    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.utils.torch_interop import (
        load_torch_checkpoint,
        save_torch_checkpoint,
    )

    cfg, model, variables = _flax_model_and_templates()
    cfg.ckpt_path = str(tmp_path)
    state = TrainState(step=np.zeros(()), params=variables["params"],
                       batch_stats=variables["batch_stats"], opt_state=())
    path = save_torch_checkpoint(cfg, state, epoch=1, acc=0.25)
    assert path.endswith(".pth")

    loaded = load_torch_checkpoint(path)  # metadata round-trip
    assert loaded["fusion"] == "concat" and loaded["acc"] == 0.25

    oracle = TorchAVClassifierDGL().eval()
    sd = torch.load(path, map_location="cpu", weights_only=False)["model"]
    sd = {k[len("module."):]: v for k, v in sd.items()}
    oracle.load_state_dict(sd, strict=True)

    rng = np.random.default_rng(1)
    spec = rng.standard_normal((2, 64, 48, 1)).astype(np.float32)
    image = rng.standard_normal((2, 2, 64, 64, 3)).astype(np.float32)
    out, out_a, out_v = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(spec), jnp.asarray(image), train=False)
    with torch.no_grad():
        t_a, t_v, t_out = oracle(
            torch.from_numpy(spec.transpose(0, 3, 1, 2)),
            torch.from_numpy(image.transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_strict_false_keeps_template_for_missing_keys(saved_reference_ckpt):
    from gdl_tpu.utils.torch_interop import (
        load_torch_checkpoint,
        torch_state_dict_to_flax,
    )

    path, _ = saved_reference_ckpt
    cfg, model, variables = _flax_model_and_templates()
    loaded = load_torch_checkpoint(path)
    sd = dict(loaded["model"])
    dropped = [k for k in sd if "fc_out" in k]
    for k in dropped:
        del sd[k]
    params, _, report = torch_state_dict_to_flax(
        sd, variables["params"], variables["batch_stats"], strict=False)
    assert len(report["missing"]) == len(dropped)
    np.testing.assert_array_equal(
        np.asarray(params["fusion_module"]["fc_out"]["kernel"]),
        np.asarray(variables["params"]["fusion_module"]["fc_out"]["kernel"]))


def test_swin_name_translation_matches_microsoft_layout():
    """The exporter emits Microsoft swin_transformer state-dict names for
    our Swin (layers.S.blocks.B..., layers.S.downsample.reduction,
    mlp.fc1/fc2, patch_embed.proj, relative_position_bias_table), and the
    round trip through torch layouts is exact — so a real pretrained
    Swin-B torch checkpoint partial-loads via --pretrained_path."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.models.swin import SwinTransformer
    from gdl_tpu.utils.torch_interop import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    cfg = Config(dataset="CREMAD", backbone="swin", swin_embed_dim=16,
                 swin_depths=[1, 1], swin_heads=[2, 2], swin_window=7,
                 swin_img_size=56, swin_patch=4)
    model = SwinTransformer(
        patch_size=4, embed_dim=16, depths=(1, 1), num_heads=(2, 2),
        window=7, img_size=56, modality="visual")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 1, 56, 56, 3)), train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    sd = flax_to_torch_state_dict(params, stats, prefix="")
    expected = [
        "patch_embed.proj.weight",
        "patch_embed.proj.bias",
        "patch_embed.norm.weight",
        "layers.0.blocks.0.norm1.weight",
        "layers.0.blocks.0.attn.relative_position_bias_table",
        "layers.0.blocks.0.attn.qkv.weight",
        "layers.0.blocks.0.attn.proj.bias",
        "layers.0.blocks.0.mlp.fc1.weight",
        "layers.0.blocks.0.mlp.fc2.bias",
        "layers.0.downsample.reduction.weight",
        "layers.0.downsample.norm.weight",
        "layers.1.blocks.0.attn.qkv.weight",
        "norm.weight",
    ]
    for key in expected:
        assert key in sd, (key, sorted(sd)[:20])
    # patch-embed conv in torch layout [C, 3, 4, 4]
    assert sd["patch_embed.proj.weight"].shape == (16, 3, 4, 4)
    # qkv linear in torch layout [3C, C]
    assert sd["layers.0.blocks.0.attn.qkv.weight"].shape == (48, 16)

    # exact round trip (torch checkpoints also carry buffers we ignore)
    sd["layers.0.blocks.0.attn.relative_position_index"] = np.zeros(
        (49, 49), np.int64)
    sd["head.weight"] = np.zeros((1000, 32), np.float32)
    new_params, _, report = torch_state_dict_to_flax(
        sd, params, stats, strict=False)
    assert not report["missing"], report["missing"][:5]
    assert set(report["unexpected"]) == {
        "layers.0.blocks.0.attn.relative_position_index", "head.weight"}
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(new_params)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
