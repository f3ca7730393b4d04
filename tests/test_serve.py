"""AOT serving export (gdl_tpu/serve.py): the jax.export artifact round-
trips through bytes and replays the exact eval forward with no model code.
The reference has no serving path (valid.py re-runs the Python model);
this is the TPU-native production equivalent."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gdl_tpu.config import Config
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.serve import export_eval, load_exported, save_exported

TINY = dict(encoder_width=8, encoder_stages=[1, 1, 1, 1], batch_size=2,
            fps=1, dataset="CREMAD", fusion_method="concat",
            modality="full", log_grad_csv=False)


def _tiny_model_and_vars():
    cfg = Config(**TINY)
    model = AVClassifierDGL(config=cfg)
    f, t = cfg.spec_shape
    audio = jnp.asarray(
        np.random.RandomState(0).randn(2, f, t, 1), jnp.float32)
    visual = jnp.asarray(
        np.random.RandomState(1).randn(2, 1, 224, 224, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, audio, visual,
                           train=False)
    return model, variables, audio, visual


def test_export_roundtrip_matches_live_model(tmp_path):
    model, variables, audio, visual = _tiny_model_and_vars()
    ref = model.apply(variables, audio, visual, train=False)

    exported = export_eval(model, variables, (audio, visual))
    path = os.path.join(tmp_path, "model.hlo")
    save_exported(exported, path)
    assert os.path.getsize(path) > 1000  # weights baked in

    loaded = load_exported(path)
    out = loaded.call(audio, visual)
    assert len(out) == len(ref) == 3  # (out, out_a, out_v)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_export_rejects_wrong_shapes(tmp_path):
    model, variables, audio, visual = _tiny_model_and_vars()
    exported = export_eval(model, variables, (audio, visual))
    bad_audio = jnp.zeros((3,) + audio.shape[1:], audio.dtype)
    try:
        exported.call(bad_audio, jnp.zeros((3,) + visual.shape[1:],
                                           visual.dtype))
        raised = False
    except Exception:
        raised = True
    assert raised  # concrete-shape artifact: batch size is pinned


def test_poly_batch_export_serves_any_batch(tmp_path):
    """poly_batch=True exports a SYMBOLIC leading batch dim (jax.export
    shape polymorphism): one artifact replays the eval forward at batch
    sizes it never saw, where the fixed-shape artifact rejects them
    (test_export_rejects_wrong_shapes). Exercises the valid.py
    --export_poly_batch path end-to-end through serialization."""
    model, variables, audio, visual = _tiny_model_and_vars()
    exported = export_eval(model, variables, (audio, visual),
                           poly_batch=True)
    # the in-avals really are symbolic, not the example batch
    assert not isinstance(exported.in_avals[0].shape[0], int)

    path = os.path.join(tmp_path, "model_poly.hlo")
    save_exported(exported, path)
    loaded = load_exported(path)
    f, t = audio.shape[1], audio.shape[2]
    for bs in (1, 2, 5):
        a = jnp.asarray(np.random.RandomState(10 + bs).randn(bs, f, t, 1),
                        jnp.float32)
        v = jnp.asarray(
            np.random.RandomState(20 + bs).randn(bs, 1, 224, 224, 3),
            jnp.float32)
        got = loaded.call(a, v)
        ref = model.apply(variables, a, v, train=False)
        assert len(got) == 3
        for g, r in zip(got, ref):
            assert g.shape == (bs, 6)
            # the poly lowering fuses/reassociates differently from the
            # per-shape jit — tolerance, not bit equality
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-4, atol=1e-5)
    # non-batch dims stay pinned: a wrong spectrogram shape is rejected
    try:
        loaded.call(jnp.zeros((2, f + 1, t, 1), jnp.float32),
                    jnp.zeros((2, 1, 224, 224, 3), jnp.float32))
        raised = False
    except Exception:
        raised = True
    assert raised


def test_poly_batch_export_swin_family(tmp_path):
    """The swin classifier traces under a symbolic batch too (the
    resident-layout reshapes are all shape-derived; the fused-MLP int()
    shape cast only runs inside the TPU kernel branch, models/swin.py
    _mlp). Tiny 56x56 2-stage swin to keep the 1-core compile bounded."""
    from gdl_tpu.models.classifier import AVClassifierSwinDGL

    cfg = Config(**dict(TINY, backbone="swin", swin_embed_dim=16,
                        swin_depths=[1, 1], swin_heads=[2, 4],
                        swin_window=7, swin_img_size=56, swin_patch=4,
                        use_pallas_attn=False))
    model = AVClassifierSwinDGL(config=cfg)
    a = jnp.zeros((2, 56, 56, 1), jnp.float32)
    v = jnp.zeros((2, 1, 56, 56, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, a, v,
                           train=False)
    exported = export_eval(model, variables, (a, v), poly_batch=True)
    path = os.path.join(tmp_path, "swin_poly.hlo")
    save_exported(exported, path)
    loaded = load_exported(path)
    for bs in (1, 3):
        aa = jnp.asarray(np.random.RandomState(bs).randn(bs, 56, 56, 1),
                         jnp.float32)
        vv = jnp.asarray(
            np.random.RandomState(bs + 9).randn(bs, 1, 56, 56, 3),
            jnp.float32)
        got = loaded.call(aa, vv)
        ref = model.apply(variables, aa, vv, train=False)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)


def test_export_from_checkpoint_end_to_end(tmp_path):
    """The valid.py --export_path path: save a legacy checkpoint, build the
    serving artifact from it, and replay — logits match the live model
    loaded from the same checkpoint."""
    from gdl_tpu.serve import export_from_checkpoint
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.optim import make_optimizer
    from gdl_tpu.utils.checkpoint import save_legacy_checkpoint

    cfg = Config(**dict(TINY, ckpt_path=str(tmp_path)))
    model = AVClassifierDGL(config=cfg)
    # PRNGKey(7), NOT the exporter's internal PRNGKey(0) init
    # (serve.py export_from_checkpoint) — the artifact only matches the
    # live model if the checkpoint was actually restored, so a no-op
    # restore_params_into_state fails this test.
    state = create_train_state(model, cfg, jax.random.PRNGKey(7),
                               make_optimizer(cfg, 1))
    ckpt = save_legacy_checkpoint(cfg, state, epoch=1, acc=0.5)

    out_path = os.path.join(tmp_path, "model.hlo")
    export_from_checkpoint(cfg, ckpt, out_path, batch_size=2)

    f, t = cfg.spec_shape
    audio = jnp.asarray(np.random.RandomState(2).randn(2, f, t, 1),
                        jnp.float32)
    visual = jnp.asarray(np.random.RandomState(3).randn(2, 1, 224, 224, 3),
                         jnp.float32)
    ref = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      audio, visual, train=False)
    got = load_exported(out_path).call(audio, visual)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_multi_platform_export(tmp_path):
    """One artifact lowered for BOTH cpu and tpu (the
    export_from_checkpoint default) — replayable on the CPU backend here,
    carrying a tpu lowering for serving there."""
    from gdl_tpu.serve import export_eval

    model, variables, audio, visual = _tiny_model_and_vars()
    exported = export_eval(model, variables, (audio, visual),
                           platforms=("cpu", "tpu"))
    assert set(exported.platforms) == {"cpu", "tpu"}
    path = os.path.join(tmp_path, "model_multi.hlo")
    save_exported(exported, path)
    got = load_exported(path).call(audio, visual)
    ref = model.apply(variables, audio, visual, train=False)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_intermediate_export_roundtrip(tmp_path):
    """main_intermediate.py --export_path: the intermediate family's
    serving artifact replays the exact eval forward for each output
    contract (MMTM triple / SE-fusion single / SURF_Fomer_N 7-tuple)."""
    import pytest  # noqa: F401  (kept for symmetry with the suite style)

    from gdl_tpu.models import transformer as _t
    from gdl_tpu.models.intermediate import build_intermediate
    from gdl_tpu.serve import export_intermediate_from_checkpoint
    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.train.optim import make_optimizer
    from gdl_tpu.utils.checkpoint import save_legacy_checkpoint

    cfg = Config(**dict(TINY, ckpt_path=str(tmp_path)))
    f, t = cfg.spec_shape
    audio = jnp.asarray(np.random.RandomState(4).randn(2, f, t, 1),
                        jnp.float32)
    visual = jnp.asarray(np.random.RandomState(5).randn(2, 1, 224, 224, 3),
                         jnp.float32)

    for name, n_out, kwargs in (("mmtm", 3, {}),
                                ("sefusion", 1, {}),
                                ("mmformer_n", 7,
                                 {"embed_dim": 32})):
        model, _ = build_intermediate(name, cfg.n_classes,
                                      cfg.encoder_width, **kwargs)
        # PRNGKey(7) != the exporter's internal PRNGKey(0) init
        # (serve.py:167) — see test_export_from_checkpoint_end_to_end.
        rng = jax.random.PRNGKey(7)
        variables = model.init({"params": rng, "drop": rng,
                                "dropout": rng, "pe": rng},
                               audio, visual, train=False, av_inputs=True)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=make_optimizer(cfg, 1).init(
                               variables["params"]))
        ckpt = save_legacy_checkpoint(cfg, state, epoch=1, acc=0.5)

        out_path = os.path.join(tmp_path, f"{name}.hlo")
        flag_before = _t.SA_PALLAS_EVAL
        export_intermediate_from_checkpoint(cfg, name, ckpt, out_path,
                                            batch_size=2,
                                            platforms=("cpu",), **kwargs)
        # the eval-kernel gate is threaded via the model's use_pallas
        # constructor flag — the module global is never mutated
        assert _t.SA_PALLAS_EVAL == flag_before

        ref = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          audio, visual, train=False, av_inputs=True)
        got = load_exported(out_path).call(audio, visual)
        if n_out == 1:
            got, ref = (got,), (ref,)
        assert len(got) == len(ref) == n_out
        for g, r in zip(got, ref):
            # CPU oneDNN GEMMs reassociate between compiles (~1e-6 rel;
            # the same artifact noted for batched_inter in
            # models/intermediate.py) — exact on TPU, loose here
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)
        os.remove(ckpt)  # next model reuses the ckpt dir


def test_joint_family_export_from_checkpoint(tmp_path):
    """main.py --export_path (the joint/OGM lineage, last round's CLI
    addition): export_from_checkpoint(dgl=False) builds AVClassifier,
    restores the saved checkpoint, and the serialized artifact replays
    the 11-tuple eval contract (reference main.py:164-165) against the
    live model."""
    from gdl_tpu.models.classifier import AVClassifier
    from gdl_tpu.serve import export_from_checkpoint
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.optim import make_optimizer
    from gdl_tpu.utils.checkpoint import save_legacy_checkpoint

    cfg = Config(**dict(TINY, ckpt_path=str(tmp_path)))
    model = AVClassifier(config=cfg)
    # PRNGKey(11) != the exporter's internal PRNGKey(0) init — the
    # artifact only matches if the checkpoint restore actually happened
    # (see test_export_from_checkpoint_end_to_end).
    state = create_train_state(model, cfg, jax.random.PRNGKey(11),
                               make_optimizer(cfg, 1))
    ckpt = save_legacy_checkpoint(cfg, state, epoch=1, acc=0.5)

    out_path = os.path.join(tmp_path, "joint.hlo")
    export_from_checkpoint(cfg, ckpt, out_path, batch_size=2, dgl=False)

    f, t = cfg.spec_shape
    audio = jnp.asarray(np.random.RandomState(6).randn(2, f, t, 1),
                        jnp.float32)
    visual = jnp.asarray(
        np.random.RandomState(7).randn(2, 1, 224, 224, 3), jnp.float32)
    ref = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      audio, visual, train=False)
    got = load_exported(out_path).call(audio, visual)
    assert len(got) == len(ref) == 11
    for g, r in zip(got, ref):
        # the 11-tuple includes pre-pool feature maps; CPU oneDNN GEMMs
        # reassociate between compiles (~1e-6 abs — the same artifact the
        # intermediate export test documents). Exact on TPU.
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)
