#!/usr/bin/env python
"""Benchmark sweep on the local accelerator; writes benchmarks/RESULTS.md.

Each config is a full jitted train step (on-device preprocessing included
where noted). One accelerator process at a time — the harness runs configs
sequentially in this process.

    python benchmarks/run_all.py [--iters 20] [--configs resnet_bs64 ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_resnet(batch_size: int, iters: int, preprocess_on: bool = True,
                 dataset: str = "CREMAD", fps: int = 1,
                 modality: str = "full"):
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.data.preprocess import make_eval_preprocess, make_train_preprocess
    from gdl_tpu.data.synthetic import synthetic_batch
    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.dgl import create_train_state, make_dgl_train_step
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset=dataset, fusion_method="concat", modality=modality,
                 fps=fps, batch_size=batch_size, compute_dtype="bfloat16",
                 log_grad_csv=False)
    model = AVClassifierDGL(config=cfg, dtype=jnp.bfloat16)
    opt = make_optimizer(cfg, 104)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, opt)
    raw = {k: jnp.asarray(v)
           for k, v in synthetic_batch(cfg, batch_size).items()}
    if preprocess_on:
        pre = make_train_preprocess(cfg)
        batch = raw
    else:
        pre = None
        batch = make_eval_preprocess(cfg)(raw)
    step = jax.jit(make_dgl_train_step(model, cfg, opt, preprocess=pre,
                                       base_rng=rng), donate_argnums=(0,))
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt, dt / iters * 1e3


def bench_swin(batch_size: int, iters: int, pallas: bool = False,
               fuse_mlp: bool = False):
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierSwin
    from gdl_tpu.train.joint import make_joint_train_step
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", fusion_method="concat", backbone="swin",
                 alpha=1.0, batch_size=batch_size,
                 compute_dtype="bfloat16", modulation="Normal",
                 log_grad_csv=False, fps=1, use_pallas_attn=pallas,
                 fuse_mlp=fuse_mlp)
    model = AVClassifierSwin(config=cfg, dtype=jnp.bfloat16)
    opt = make_optimizer(cfg, 100)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt,
                               spec_shape=(224, 224), frames=1)
    r = jax.random.PRNGKey(1)
    batch = {"audio": jax.random.normal(r, (batch_size, 224, 224, 1)),
             "visual": jax.random.normal(r, (batch_size, 1, 224, 224, 3)),
             "label": jnp.zeros((batch_size,), jnp.int32)}
    step = jax.jit(make_joint_train_step(model, cfg, opt, 100),
                   donate_argnums=(0,))
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt, dt / iters * 1e3


def bench_swin_dgl(batch_size: int, iters: int, pallas: bool = True):
    """VGGSound-scale DGL train step with dual Swin-B encoders
    (AVClassifierSwinDGL — the BASELINE 'full-scale DGL with Swin' row)."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierSwinDGL
    from gdl_tpu.train.dgl import create_train_state, make_dgl_train_step
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="VGGSound", fusion_method="concat", backbone="swin",
                 modality="full", batch_size=batch_size,
                 compute_dtype="bfloat16", log_grad_csv=False, fps=1,
                 use_pallas_attn=pallas)
    model = AVClassifierSwinDGL(config=cfg, dtype=jnp.bfloat16)
    opt = make_optimizer(cfg, 100)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt,
                               spec_shape=(224, 224), frames=1)
    r = jax.random.PRNGKey(1)
    batch = {"audio": jax.random.normal(r, (batch_size, 224, 224, 1)),
             "visual": jax.random.normal(r, (batch_size, 1, 224, 224, 3)),
             "label": jnp.zeros((batch_size,), jnp.int32)}
    step = jax.jit(make_dgl_train_step(model, cfg, opt,
                                       base_rng=jax.random.PRNGKey(2)),
                   donate_argnums=(0,))
    for _ in range(2):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt, dt / iters * 1e3


def bench_intermediate(model_name: str, batch_size: int, iters: int,
                       share_streams: bool = False):
    """Intermediate-fusion family (MMTM / SE-fusion / mmformer) train
    step — the main_intermediate.py path on synthetic CREMA-D shapes."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.train.auxi import make_auxi_train_step
    from gdl_tpu.train.dgl import TrainState
    from gdl_tpu.train.optim import make_optimizer
    from main_intermediate import build_model, make_sefusion_step

    cfg = Config(dataset="CREMAD", batch_size=batch_size, fps=1,
                 compute_dtype="bfloat16", log_grad_csv=False)
    model, kind = build_model(model_name, cfg.n_classes, 64,
                              dtype=jnp.bfloat16,
                              share_streams=share_streams)
    opt = make_optimizer(cfg, 100)
    rng = jax.random.PRNGKey(0)
    f, t = cfg.spec_shape
    variables = model.init({"params": rng, "drop": rng, "dropout": rng,
                            "pe": rng},
                           jnp.zeros((2, f, t, 1)),
                           jnp.zeros((2, 1, 224, 224, 3)),
                           train=False, av_inputs=True)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt.init(variables["params"]))
    if kind == "single":
        raw = make_sefusion_step(model, cfg, opt, rng)
    else:
        raw = make_auxi_train_step(model, cfg, opt,
                                   seven_tuple=kind == "seven",
                                   base_rng=rng, av_inputs=True)
    r = jax.random.PRNGKey(1)
    batch = {"audio": jax.random.normal(r, (batch_size, f, t, 1)),
             "visual": jax.random.normal(r, (batch_size, 1, 224, 224, 3)),
             "label": jnp.zeros((batch_size,), jnp.int32)}

    # chain `iters` steps INSIDE one jit (state is the carry) and force
    # with a host transfer — per-call loops through the tunnel reported
    # 1.17 ms/step for MMTM (impossible; dispatch pipelining)
    @jax.jit
    def many(state):
        def body(_, s):
            s2, _ = raw(s, batch)
            return s2
        return jax.lax.fori_loop(0, iters, body, state)

    final = many(state)
    float(jax.tree.leaves(final.params)[0].reshape(-1)[0])  # compile+warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        final = many(state)
        float(jax.tree.leaves(final.params)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    return batch_size / dt, dt * 1e3


def bench_swin_gated(batch_size: int, iters: int, fused_bwd=None,
                     quad_shift=None, gn_barrier=None, proj_boundary=None):
    """bench_swin under the module-level kernel gates (phase-2/auto
    fused projection backward, quadrant shift lowering, grad-norm
    materialize barrier). Clears jax caches around the run so the
    trace-time gates actually apply, and restores the defaults after."""
    import jax

    import gdl_tpu.models.swin as sm
    import gdl_tpu.ops.window_attention as wa
    import gdl_tpu.train.optim as opt_mod

    jax.clear_caches()
    old_b = wa.FUSED_PROJECTION_BACKWARD
    old_q = sm.SHIFT_QUADRANT_LOWERING
    old_g = opt_mod.GN_MATERIALIZE_BARRIER
    old_p = sm.PROJ_BOUNDARY
    if fused_bwd is not None:
        wa.FUSED_PROJECTION_BACKWARD = fused_bwd
    if quad_shift is not None:
        sm.SHIFT_QUADRANT_LOWERING = quad_shift
    if gn_barrier is not None:
        opt_mod.GN_MATERIALIZE_BARRIER = gn_barrier
    if proj_boundary is not None:
        sm.PROJ_BOUNDARY = proj_boundary
    try:
        return bench_swin(batch_size, iters, pallas=True)
    finally:
        wa.FUSED_PROJECTION_BACKWARD = old_b
        sm.SHIFT_QUADRANT_LOWERING = old_q
        opt_mod.GN_MATERIALIZE_BARRIER = old_g
        sm.PROJ_BOUNDARY = old_p
        jax.clear_caches()


def bench_swin_eval(batch_size: int, iters: int, pallas: bool = False,
                    fused_eval: bool = False):
    """Forward-only (serving/eval) dual-Swin throughput."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierSwin
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", fusion_method="concat", backbone="swin",
                 alpha=1.0, batch_size=batch_size,
                 compute_dtype="bfloat16", modulation="Normal",
                 log_grad_csv=False, fps=1, use_pallas_attn=pallas,
                 use_pallas_attn_eval=fused_eval)
    model = AVClassifierSwin(config=cfg, dtype=jnp.bfloat16)
    opt = make_optimizer(cfg, 100)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), opt,
                               spec_shape=(224, 224), frames=1)
    r = jax.random.PRNGKey(1)
    audio = jax.random.normal(r, (batch_size, 224, 224, 1), jnp.bfloat16)
    visual = jax.random.normal(r, (batch_size, 1, 224, 224, 3),
                               jnp.bfloat16)

    # device time via a dependency-chained fori_loop inside ONE jit (the
    # only trustworthy method through the remote tunnel — per-call loops
    # mis-report in BOTH directions, see the timing note in RESULTS.md)
    @jax.jit
    def many(params, stats, audio, visual):
        def body(_, a):
            out = model.apply({"params": params, "batch_stats": stats},
                              a, visual, train=False)[2]
            return a + (jnp.sum(out) * 1e-8).astype(a.dtype)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, audio)
                       .astype(jnp.float32))

    import time as _t

    float(many(state.params, state.batch_stats, audio, visual))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        float(many(state.params, state.batch_stats, audio, visual))
        best = min(best, _t.perf_counter() - t0)
    dt = best / iters
    return batch_size / dt, dt * 1e3


def bench_resnet_eval(batch_size: int, iters: int, export: bool = False,
                      width: int = 64, stages=None, poly: bool = False):
    """Forward-only (serving/eval) flagship throughput — CREMA-D dual
    ResNet-18 DGL classifier on preprocessed inputs (the shapes the AOT
    serving artifact consumes; the eval STFT is measured separately by
    the *_no_preproc train delta). export=True replays the actual
    jax.export artifact (serve.export_eval) instead of model.apply —
    same program modulo the export round-trip, so the pair verifies the
    serialization path adds no overhead."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.dgl import create_train_state
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 fps=1, batch_size=batch_size, compute_dtype="bfloat16",
                 log_grad_csv=False, encoder_width=width,
                 encoder_stages=list(stages) if stages else [2, 2, 2, 2])
    model = AVClassifierDGL(config=cfg, dtype=jnp.bfloat16)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               make_optimizer(cfg, 100))
    r = jax.random.PRNGKey(1)
    f, t = cfg.spec_shape
    audio = jax.random.normal(r, (batch_size, f, t, 1), jnp.bfloat16)
    visual = jax.random.normal(r, (batch_size, cfg.fps, 224, 224, 3),
                               jnp.bfloat16)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if export:
        from gdl_tpu.serve import export_eval

        # poly=True replays the batch-POLYMORPHIC artifact (symbolic
        # leading dim, --export_poly_batch) — XLA specializes it to the
        # concrete batch at call time, so this measures what a
        # variable-batch serving fleet actually runs vs the fixed-shape
        # artifact (resnet_export_bs64)
        exported = export_eval(model, variables, (audio, visual),
                               poly_batch=poly)
        fwd = lambda a, v: exported.call(a, v)[0]
    else:
        fwd = lambda a, v: model.apply(variables, a, v, train=False)[0]

    @jax.jit
    def many(audio, visual):
        def body(_, a):
            out = fwd(a, visual)
            return a + (jnp.sum(out) * 1e-8).astype(a.dtype)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, audio)
                       .astype(jnp.float32))

    import time as _t

    float(many(audio, visual))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        float(many(audio, visual))
        best = min(best, _t.perf_counter() - t0)
    dt = best / iters
    return batch_size / dt, dt * 1e3


def bench_intermediate_eval(model_name: str, batch_size: int, iters: int,
                            pallas_eval: bool = False):
    """Forward-only (serving/eval) intermediate-family throughput; the
    A/B for SA_PALLAS_EVAL (the residual-free fused eval kernel)."""
    import jax
    import jax.numpy as jnp

    import gdl_tpu.models.transformer as tr
    from gdl_tpu.config import Config
    from main_intermediate import build_model

    jax.clear_caches()
    old = tr.SA_PALLAS_EVAL
    tr.SA_PALLAS_EVAL = pallas_eval
    try:
        cfg = Config(dataset="CREMAD", batch_size=batch_size, fps=1,
                     compute_dtype="bfloat16", log_grad_csv=False)
        model, _ = build_model(model_name, cfg.n_classes, 64,
                               dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        f, t = cfg.spec_shape
        variables = model.init({"params": rng, "drop": rng,
                                "dropout": rng, "pe": rng},
                               jnp.zeros((2, f, t, 1)),
                               jnp.zeros((2, 1, 224, 224, 3)),
                               train=False, av_inputs=True)
        r = jax.random.PRNGKey(1)
        audio = jax.random.normal(r, (batch_size, f, t, 1), jnp.bfloat16)
        visual = jax.random.normal(r, (batch_size, 1, 224, 224, 3),
                                   jnp.bfloat16)

        @jax.jit
        def many(variables, audio, visual):
            def body(_, a):
                out = model.apply(variables, a, visual, train=False,
                                  av_inputs=True)[0]
                return a + (jnp.sum(out) * 1e-8).astype(a.dtype)

            return jnp.sum(jax.lax.fori_loop(0, iters, body, audio)
                           .astype(jnp.float32))

        import time as _t

        float(many(variables, audio, visual))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = _t.perf_counter()
            float(many(variables, audio, visual))
            best = min(best, _t.perf_counter() - t0)
        dt = best / iters
        return batch_size / dt, dt * 1e3
    finally:
        tr.SA_PALLAS_EVAL = old
        jax.clear_caches()


CONFIGS = {
    "resnet_bs64": lambda it: bench_resnet(64, it),
    "resnet_bs64_no_preproc": lambda it: bench_resnet(64, it, False),
    "resnet_bs256": lambda it: bench_resnet(256, max(it // 2, 5)),
    "resnet_bs512": lambda it: bench_resnet(512, max(it // 4, 3)),
    "ks_bs64": lambda it: bench_resnet(64, it, dataset="KineticSound",
                                       fps=3),
    # unimodal DGL lineages ((2α+1)·CE, reference main_dgl.py:102-122):
    # audio is the bench.py unimodal anchor; visual (the 224² RGB ResNet
    # stream — the heavier encoder) gets its capacity point here
    "dgl_audio_bs64": lambda it: bench_resnet(64, it, modality="audio"),
    "dgl_visual_bs64": lambda it: bench_resnet(64, it, modality="visual"),
    "mmtm_bs64": lambda it: bench_intermediate("mmtm", 64, it),
    "sefusion_bs64": lambda it: bench_intermediate("sefusion", 64, it),
    "mmformer_bs64": lambda it: bench_intermediate("mmformer_n", 64, it),
    "mmformer_bs128": lambda it: bench_intermediate("mmformer_n", 128,
                                                    max(it // 2, 5)),
    # opt-in --share_unimodal_streams perf mode (eval bit-identical;
    # train changes dropout correlation + BN stat count — RESULTS.md)
    "mmformer_bs64_shared": lambda it: bench_intermediate(
        "mmformer_n", 64, it, share_streams=True),
    # batch + shared-streams combined (each won independently: bs128
    # +3.9% unshared, shared +13% at bs64 — the family's two remaining
    # levers stack or they don't; RESULTS.md)
    "mmformer_bs128_shared": lambda it: bench_intermediate(
        "mmformer_n", 128, max(it // 2, 5), share_streams=True),
    # next point on the batch curve past the bs128 983 clips/s record —
    # does the shared-streams config keep scaling or hit the bs512-style
    # flagship regression? (RESULTS.md round-5b)
    "mmformer_bs256_shared": lambda it: bench_intermediate(
        "mmformer_n", 256, max(it // 4, 3), share_streams=True),
    "resnet_eval_bs64": lambda it: bench_resnet_eval(64, it),
    "resnet_eval_bs256": lambda it: bench_resnet_eval(256, max(it // 2, 5)),
    # replays the serialized jax.export artifact — pairs with
    # resnet_eval_bs64 to verify the serving round-trip is overhead-free
    "resnet_export_bs64": lambda it: bench_resnet_eval(64, it, export=True),
    # the batch-polymorphic artifact at the same batch — the cost of
    # --export_poly_batch relative to the fixed-shape export
    "resnet_export_poly_bs64": lambda it: bench_resnet_eval(
        64, it, export=True, poly=True),
    "mmformer_eval_bs64": lambda it: bench_intermediate_eval(
        "mmformer_n", 64, it),
    "mmformer_eval_bs64_pallas": lambda it: bench_intermediate_eval(
        "mmformer_n", 64, it, pallas_eval=True),
    "swin_bs16": lambda it: bench_swin(16, max(it // 2, 5)),
    "swin_bs16_pallas": lambda it: bench_swin(16, max(it // 2, 5),
                                              pallas=True),
    "swin_dgl_bs16": lambda it: bench_swin_dgl(16, max(it // 2, 5)),
    "swin_dgl_bs32": lambda it: bench_swin_dgl(32, max(it // 2, 5)),
    # fused fc1+gelu+fc2 MLP Pallas kernel, recompute backward
    # (ops/mlp.py, --fuse_mlp)
    "swin_bs32_fusemlp": lambda it: bench_swin(32, max(it // 2, 5),
                                               pallas=True, fuse_mlp=True),
    "swin_bs32_pallas": lambda it: bench_swin(32, max(it // 2, 5),
                                              pallas=True),
    "swin_bs64_pallas": lambda it: bench_swin(64, max(it // 4, 5),
                                              pallas=True),
    "swin_dgl_bs16_xla": lambda it: bench_swin_dgl(16, max(it // 2, 5),
                                                   pallas=False),
    "swin_eval_bs16": lambda it: bench_swin_eval(16, it),
    # Gate-verification run: WindowAttention only uses Pallas when
    # train=True, so this compiles the SAME program as swin_eval_bs16 and
    # must report the same number (verifies the eval path ignores the flag).
    "swin_eval_bs16_pallas_gatecheck": lambda it: bench_swin_eval(
        16, it, pallas=True),
    # forward-only fused eval kernel (use_pallas_attn_eval — the shipped
    # default after the A/B: 13.21 vs 13.96 ms/step; swin_eval_bs16
    # above measures the XLA eval path it replaced)
    "swin_eval_bs16_fused": lambda it: bench_swin_eval(
        16, it, pallas=True, fused_eval=True),
    # kernel-gate A/Bs (module-level flags, cache-cleared per run).
    # No fused_bwd=True config: at Swin-B shapes True resolves to the
    # same per-stage split as "auto" (stage 4's 12.6 MB dW slab OOMed
    # scoped VMEM at 18.01M/16M on hardware — the feasibility fallback
    # in window_attention.py records that negative).
    "swin_bs32_phase2auto": lambda it: bench_swin_gated(
        32, max(it // 2, 5), fused_bwd="auto"),
    "swin_bs32_gnbarrier": lambda it: bench_swin_gated(
        32, max(it // 2, 5), gn_barrier=True),
    "swin_bs32_quadshift": lambda it: bench_swin_gated(
        32, max(it // 2, 5), quad_shift=True),
    # proj-GEMM boundary lowering A/Bs (swin.py PROJ_BOUNDARY)
    "swin_bs32_proj_pad56": lambda it: bench_swin_gated(
        32, max(it // 2, 5), proj_boundary="pad56"),
    "swin_bs32_proj_flat2d": lambda it: bench_swin_gated(
        32, max(it // 2, 5), proj_boundary="flat2d"),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--configs", nargs="*", default=list(CONFIGS))
    args = parser.parse_args()

    import jax

    results = {}
    for name in args.configs:
        clips, ms = CONFIGS[name](args.iters)
        results[name] = {"clips_per_sec": round(clips, 1),
                         "ms_per_step": round(ms, 2)}
        print(json.dumps({name: results[name]}), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "RESULTS.md")
    with open(path, "a") as f:
        f.write(f"\n## run on {jax.devices()[0].device_kind} "
                f"({time.strftime('%Y-%m-%d %H:%M')})\n\n")
        f.write("| config | clips/s | ms/step |\n|---|---|---|\n")
        for name, r in results.items():
            f.write(f"| {name} | {r['clips_per_sec']} | "
                    f"{r['ms_per_step']} |\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
