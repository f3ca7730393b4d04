"""The flagship serving benches (benchmarks/run_all.py bench_resnet_eval)
stay runnable and self-consistent: the direct model.apply path and the
jax.export-artifact replay path both execute, and the artifact computes
the SAME logits as the live model (the round-trip adds serialization, not
math). Runs at tiny width on the CPU backend — the hardware numbers live
in benchmarks/RESULTS.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_resnet_eval_bench_paths_run_and_agree():
    from benchmarks.run_all import bench_resnet_eval

    c1, ms1 = bench_resnet_eval(2, 2, export=False, width=8,
                                stages=[1, 1, 1, 1])
    c2, ms2 = bench_resnet_eval(2, 2, export=True, width=8,
                                stages=[1, 1, 1, 1])
    assert c1 > 0 and ms1 > 0 and c2 > 0 and ms2 > 0


def test_export_artifact_matches_live_model():
    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.serve import export_eval
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 fps=1, batch_size=2, encoder_width=8,
                 encoder_stages=[1, 1, 1, 1], log_grad_csv=False)
    model = AVClassifierDGL(config=cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               make_optimizer(cfg, 10))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    f, t = cfg.spec_shape
    r = jax.random.PRNGKey(1)
    audio = jax.random.normal(r, (2, f, t, 1), jnp.float32)
    visual = jax.random.normal(jax.random.PRNGKey(2),
                               (2, cfg.fps, 224, 224, 3), jnp.float32)

    live = model.apply(variables, audio, visual, train=False)
    exported = export_eval(model, variables, (audio, visual))
    replay = exported.call(audio, visual)
    for a, b in zip(live, replay):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
