"""ImageNet-style partial pretrained loading (VERDICT r1 missing item 3;
reference resnet18_se.py:228-248 filter-and-load semantics): a local
torchvision-format backbone state dict loads into BOTH encoders, skipping
shape mismatches (the 1-channel audio stem) and model-only keys, exactly
like the reference's key/shape filter."""

import numpy as np
import torch

from gdl_tpu.config import Config
from tests.test_torch_interop import STAGES, WIDTH, TorchRefResNet


def _save_backbone(path):
    torch.manual_seed(3)
    backbone = TorchRefResNet(3)
    sd = backbone.state_dict()
    # torchvision resnet18 state dicts also carry fc.* — must be ignored
    sd["fc.weight"] = torch.randn(10, 8 * WIDTH)
    sd["fc.bias"] = torch.randn(10)
    torch.save(sd, path)
    return backbone


def test_partial_load_into_both_encoders(tmp_path):
    import jax
    import jax.numpy as jnp

    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.utils.torch_interop import load_pretrained_encoders

    path = str(tmp_path / "imagenet_resnet18.pth")
    backbone = _save_backbone(path)

    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 modulation="Normal", fps=1, batch_size=2,
                 encoder_width=WIDTH, encoder_stages=list(STAGES))
    model = AVClassifierDGL(config=cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, 32, 24, 1)),
                           jnp.zeros((2, 1, 32, 32, 3)), train=False)
    state = TrainState(step=np.zeros(()), params=variables["params"],
                       batch_stats=variables["batch_stats"], opt_state=())
    orig_audio_stem = np.asarray(
        variables["params"]["audio_net"]["conv1"]["kernel"])

    new_state, reports = load_pretrained_encoders(state, path)

    # visual stem adopted the pretrained weights ([O,I,kH,kW]->[kH,kW,I,O])
    want = backbone.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(new_state.params["visual_net"]["conv1"]["kernel"]),
        want, rtol=1e-6)
    # audio stem (1-channel) was shape-skipped, kept at init
    np.testing.assert_array_equal(
        np.asarray(new_state.params["audio_net"]["conv1"]["kernel"]),
        orig_audio_stem)
    assert any("conv1.weight" in k for k in reports["audio_net"]["mismatched"])
    # deeper audio layers DID load (shapes match across modalities)
    want_l1 = (backbone.layer1[0].conv1.weight.detach().numpy()
               .transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(new_state.params["audio_net"]["layer1_0"]["conv1"]
                   ["kernel"]), want_l1, rtol=1e-6)
    # BN running stats came along
    np.testing.assert_allclose(
        np.asarray(new_state.batch_stats["visual_net"]["bn1"]["mean"]),
        backbone.bn1.running_mean.detach().numpy(), rtol=1e-6)
    # fusion head untouched
    np.testing.assert_array_equal(
        np.asarray(new_state.params["fusion_module"]["fc_out"]["kernel"]),
        np.asarray(variables["params"]["fusion_module"]["fc_out"]["kernel"]))
