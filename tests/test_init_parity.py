"""Weight-init distribution parity with utils/utils.py:15-23 `weight_init`:
xavier-normal Dense, kaiming-normal(fan_out) Conv, BN (1, 0) — checked
statistically against the torch formulas."""

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.config import Config
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.models.layers import conv_kaiming_init, dense_xavier_init


def test_dense_xavier_normal_std():
    k = dense_xavier_init(jax.random.PRNGKey(0), (512, 256), jnp.float32)
    expected = np.sqrt(2.0 / (512 + 256))
    assert np.isclose(float(jnp.std(k)), expected, rtol=0.05)
    assert abs(float(jnp.mean(k))) < 0.01


def test_conv_kaiming_fan_out_std():
    # torch kaiming_normal_(fan_out, relu): std = sqrt(2 / (out*kh*kw))
    shape = (3, 3, 64, 128)  # HWIO
    k = conv_kaiming_init(jax.random.PRNGKey(0), shape, jnp.float32)
    expected = np.sqrt(2.0 / (128 * 3 * 3))
    assert np.isclose(float(jnp.std(k)), expected, rtol=0.05)


def test_model_bn_and_bias_init():
    cfg = Config(dataset="CREMAD", fusion_method="concat", fps=1,
                 encoder_width=8, encoder_stages=[1, 1, 1, 1])
    model = AVClassifierDGL(config=cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.ones((1, 33, 20, 1)),
                   jnp.ones((1, 1, 32, 32, 3)), train=False)
    p = v["params"]
    bn = p["audio_net"]["bn1"]
    np.testing.assert_array_equal(np.asarray(bn["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(bn["bias"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(p["fusion_module"]["fc_out"]["bias"]), 0.0)
    # running stats start at (0 mean, 1 var)
    stats = v["batch_stats"]["audio_net"]["bn1"]
    np.testing.assert_array_equal(np.asarray(stats["mean"]), 0.0)
    np.testing.assert_array_equal(np.asarray(stats["var"]), 1.0)
