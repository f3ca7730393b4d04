"""Intermediate-fusion family: shape contracts, shared-weight quirk,
modality-drop semantics, PE heads, and the 7-tuple mmformer-N contract."""

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.models.intermediate import (
    MMFormer,
    MMFormerN,
    MMTM,
    MMTMNet,
    SEFusionNet,
    av_adapt,
)
from gdl_tpu.models.se_resnet import SELayer, SEStem, SETrunk
from gdl_tpu.models.transformer import (
    MODALITY_COMBINATIONS,
    fixed_positional_encoding,
    gelu_tanh,
    modality_drop,
    unbalance_modality_drop,
    TransformerModel,
)

W = 8  # tiny width for this 1-core host
RGB = jnp.ones((2, 32, 32, 3))
DEPTH = jnp.ones((2, 32, 32, 3))


def init_and_run(model, *args, train=False, rngs=None, **kw):
    variables = model.init({"params": jax.random.PRNGKey(0),
                            **(rngs or {})}, *args, train=train, **kw)
    out = model.apply(variables, *args, train=train, rngs=rngs,
                      mutable=["batch_stats"] if train else False, **kw)
    return (out[0] if train else out), variables


def test_se_layer_gates_channels():
    se = SELayer(16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 16))
    v = se.init(jax.random.PRNGKey(0), x)
    y = se.apply(v, x)
    assert y.shape == x.shape
    # a sigmoid gate strictly shrinks magnitude
    assert float(jnp.max(jnp.abs(y))) < float(jnp.max(jnp.abs(x)))


def test_se_stem_and_trunk_shapes():
    stem = SEStem(use_se=True, width=W)
    out, _ = init_and_run(stem, RGB)
    # 32 → conv/2 → pool/2 → layer2/2 = 4; channels 2w
    assert out.shape == (2, 4, 4, 2 * W)
    trunk = SETrunk(num_classes=6, width=W)
    x = jnp.concatenate([out, out], axis=-1)
    logits, _ = init_and_run(trunk, x)
    assert logits.shape == (2, 6)


def test_sefusion_net():
    model = SEFusionNet(num_classes=6, width=W)
    logits, _ = init_and_run(model, RGB, DEPTH)
    assert logits.shape == (2, 6)


def test_mmtm_recalibration():
    mmtm = MMTM(16, 16, 2)
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 16))
    b = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 16))
    v = mmtm.init(jax.random.PRNGKey(0), a, b)
    a2, b2 = mmtm.apply(v, a, b)
    assert a2.shape == a.shape and b2.shape == b.shape
    # gates are sigmoid scalars per channel — sign preserved
    assert np.all(np.sign(np.asarray(a2)) == np.sign(np.asarray(a)))


def test_mmtm_net_shared_trunk_and_outputs():
    model = MMTMNet(num_classes=6, width=W)
    out, variables = init_and_run(model, RGB, DEPTH, av_inputs=False)
    out, out_rgb, out_depth = out
    assert out.shape == (2, 6)
    # trunk layers exist ONCE (shared between streams — mmtm_net.py:341-344)
    names = set(variables["params"].keys())
    assert "layer3_0" in names and "layer4_0" in names
    assert not any(n.startswith("depth_layer") for n in names)


def test_av_adapter():
    spec = jnp.ones((2, 33, 20, 1))
    frames = jnp.ones((2, 1, 48, 48, 3))
    rgb, depth = av_adapt(spec, frames)
    assert rgb.shape == (2, 224, 224, 3)
    assert depth.shape == (2, 48, 48, 3)


def test_mmformer_three_modality():
    model = MMFormer(num_classes=6, width=W, embed_dim=32, seq_len=4)
    rngs = {"drop": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)}
    (logits, l3, l4), _ = init_and_run(model, RGB, RGB, DEPTH, train=True,
                                       rngs=rngs)
    assert logits.shape == (2, 6)
    assert l3.shape[-1] == 4 * W and l4.shape[-1] == 8 * W


def test_mmformer_n_seven_tuple():
    model = MMFormerN(num_classes=6, width=W, embed_dim=32, seq_len=4)
    out, _ = init_and_run(model, RGB, DEPTH, av_inputs=False)
    x_f, mu_rgb, std_rgb, mu_depth, std_depth, x_r, x_i = out
    assert x_f.shape == (2, 6) and x_r.shape == (2, 6) and x_i.shape == (2, 6)
    assert mu_rgb.shape == std_rgb.shape
    assert np.all(np.asarray(std_rgb) > 0)


def test_mmformer_n_share_streams_eval_identical_train_runs():
    """share_streams=True (the opt-in perf mode) must be bit-identical to
    the faithful three-pass forward at EVAL (no dropout, running BN
    stats), share the exact same parameter tree, and still train (the
    7-tuple keeps its contract and gradients flow)."""
    base = MMFormerN(num_classes=6, width=W, embed_dim=32, seq_len=4)
    shared = MMFormerN(num_classes=6, width=W, embed_dim=32, seq_len=4,
                       share_streams=True)
    variables = base.init({"params": jax.random.PRNGKey(0)}, RGB, DEPTH,
                          train=False, av_inputs=False)
    # same parameter tree: the shared variant re-uses the same modules
    v2 = shared.init({"params": jax.random.PRNGKey(0)}, RGB, DEPTH,
                     train=False, av_inputs=False)
    assert jax.tree_util.tree_structure(variables["params"]) == \
        jax.tree_util.tree_structure(v2["params"])

    out_a = base.apply(variables, RGB, DEPTH, train=False, av_inputs=False)
    out_b = shared.apply(variables, RGB, DEPTH, train=False,
                         av_inputs=False)
    for x, y in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # train mode: runs, mutates stats, and x_f gradients are nonzero
    rngs = {"dropout": jax.random.PRNGKey(3), "pe": jax.random.PRNGKey(4)}

    def loss(params):
        out, _ = shared.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            RGB, DEPTH, train=True, av_inputs=False, rngs=rngs,
            mutable=["batch_stats"])
        return sum(jnp.sum(jnp.square(o)) for o in (out[0], out[5], out[6]))

    g = jax.grad(loss)(variables["params"])
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)))
    assert np.isfinite(gn) and gn > 0


def test_modality_drop_masks():
    xs = [jnp.ones((8, 2, 2, 4))] * 3
    out, mask = modality_drop(xs, jax.random.PRNGKey(0))
    mask = np.asarray(mask)
    # every row is one of the 7 legal combinations
    legal = {tuple(r) for r in MODALITY_COMBINATIONS.astype(int).tolist()}
    assert all(tuple(r) in legal for r in mask.astype(int).tolist())
    # masked features are exactly zeroed
    for i in range(3):
        got = np.asarray(out[i]).reshape(8, -1)
        for b in range(8):
            if mask[b, i] == 0:
                assert np.all(got[b] == 0)
            else:
                assert np.all(got[b] == 1)

    # fixed combination
    out2, mask2 = modality_drop(xs, jax.random.PRNGKey(0), p=[1, 0, 1])
    assert np.all(np.asarray(mask2) == np.array([1, 0, 1]))


def test_unbalance_modality_drop_curriculum():
    xs = [jnp.ones((64, 2, 2, 4))] * 3
    _, mask_early = unbalance_modality_drop(xs, jax.random.PRNGKey(0),
                                            epoch=0)
    _, mask_late = unbalance_modality_drop(xs, jax.random.PRNGKey(0),
                                           epoch=25)
    m_early = np.asarray(mask_early).astype(int)
    m_late = np.asarray(mask_late).astype(int)
    assert m_early.shape == (64, 3)

    def count(m, combo):
        return int(np.sum(np.all(m == np.asarray(combo), axis=1)))

    # hard combos gain slots after epoch 15
    assert count(m_late, [1, 0, 0]) > count(m_early, [1, 0, 0])
    assert count(m_late, [0, 0, 1]) > count(m_early, [0, 0, 1])
    assert count(m_late, [1, 1, 1]) < count(m_early, [1, 1, 1])


def test_gelu_tanh_matches_torch_formula():
    import torch

    x = np.linspace(-3, 3, 31).astype(np.float32)
    ours = np.asarray(gelu_tanh(jnp.asarray(x)))
    ref = 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi)
                                 * (x + 0.044715 * x ** 3)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    tref = torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh")
    np.testing.assert_allclose(ours, tref.numpy(), rtol=1e-5, atol=1e-6)


def test_transformer_model_returns_intermediates():
    model = TransformerModel(dim=16, depth=2, heads=2, mlp_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    v = model.init(jax.random.PRNGKey(0), x)
    out, intermediates = model.apply(v, x)
    assert out.shape == (2, 5, 16)
    assert len(intermediates) == 2
    np.testing.assert_array_equal(np.asarray(intermediates[-1]),
                                  np.asarray(out))


def test_fixed_positional_encoding_table():
    pe = fixed_positional_encoding(10, 8)
    assert pe.shape == (10, 8)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)


def test_mmformer_n_batched_inter_eval_identical_train_runs():
    """batched_inter=True (opt-in) runs the three fusion passes'
    BN-free inter half as ONE [3B] call. Same parameter tree, eval
    identical to three separate passes in BOTH stream modes (bitwise on
    TPU; CPU oneDNN GEMMs pick batch-shape-dependent FMA orders, so the
    CPU check allows reassociation-level noise), train still learns
    (finite nonzero grads) and batch stats mutate."""
    for share in (False, True):
        sep = MMFormerN(num_classes=6, width=W, embed_dim=32, seq_len=4,
                        share_streams=share, batched_inter=False)
        bat = MMFormerN(num_classes=6, width=W, embed_dim=32, seq_len=4,
                        share_streams=share, batched_inter=True)
        variables = sep.init({"params": jax.random.PRNGKey(0)}, RGB,
                             DEPTH, train=False, av_inputs=False)
        v2 = bat.init({"params": jax.random.PRNGKey(0)}, RGB, DEPTH,
                      train=False, av_inputs=False)
        assert jax.tree_util.tree_structure(variables["params"]) == \
            jax.tree_util.tree_structure(v2["params"])

        out_a = sep.apply(variables, RGB, DEPTH, train=False,
                          av_inputs=False)
        out_b = bat.apply(variables, RGB, DEPTH, train=False,
                          av_inputs=False)
        for x, y in zip(out_a, out_b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-6, atol=2e-6)

        rngs = {"dropout": jax.random.PRNGKey(3),
                "pe": jax.random.PRNGKey(4)}

        def loss(params):
            out, updates = bat.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                RGB, DEPTH, train=True, av_inputs=False, rngs=rngs,
                mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(o))
                       for o in (out[0], out[5], out[6]))

        g = jax.grad(loss)(variables["params"])
        gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g)))
        assert np.isfinite(gn) and gn > 0, share


def test_resolve_share_streams_tri_state():
    """The driver's --share_unimodal_streams default (-1) resolves to ON
    unless --strict_compat (which keeps the reference's three independent
    fusion passes, surf_mmfomer.py:337-351); 0/1 force either mode. The
    round-4 convergence A/B (benchmarks/RESULTS.md) is the basis for the
    default-on disposition."""
    from main_intermediate import resolve_share_streams

    assert resolve_share_streams(-1, strict_compat=False) is True
    assert resolve_share_streams(-1, strict_compat=True) is False
    # explicit values win over strict_compat in both directions
    assert resolve_share_streams(0, strict_compat=False) is False
    assert resolve_share_streams(0, strict_compat=True) is False
    assert resolve_share_streams(1, strict_compat=False) is True
    assert resolve_share_streams(1, strict_compat=True) is True
