#!/usr/bin/env python
"""Benchmark: CREMA-D DGL training throughput on one TPU chip.

Measures the flagship configuration (cramed_dgl.sh:8): dual ResNet-18 +
ConcatFusion_DGL, DGL loss, SGD, global batch 64, fps=1 — the FULL jitted
step including on-device preprocessing (raw waveform → STFT → log-mag;
uint8 frames → RandomResizedCrop → flip → normalize), in bfloat16 compute.

Prints ONE JSON line:
  {"metric": ..., "value": clips/s, "unit": "clips/s", "vs_baseline": x}

vs_baseline anchor: the reference records no throughput anywhere (SURVEY
§6); REFERENCE_CLIPS_PER_SEC below is an engineering estimate of
main_dgl.py on its README hardware (single CUDA-11.1-era GPU, PyTorch
1.11): ~10.8 GFLOPs/clip trained at ~35% fp32 MFU ≈ 400 clips/s compute,
minus the per-step per-parameter .item() grad probes and CSV append that
sync the device every step (main_dgl.py:132-152) → ~300 clips/s. Replace
with a measured number when reference hardware is available.

A MEASURED floor does exist: the reference's exact training-loop
semantics at full width on this host's torch-CPU (1 thread) run at
3.71 clips/s (benchmarks/torch_cpu_baseline.py — 4.31 s/step at bs16,
22.4 M params). The GPU estimate sits between that floor and the TPU
number; both anchors are reported in the JSON.
"""

import json
import time

REFERENCE_CLIPS_PER_SEC = 300.0  # estimated; see module docstring
TORCH_CPU_FLOOR_CLIPS_PER_SEC = 3.71  # measured; torch_cpu_baseline.py

BATCH = 64
WARMUP = 3
ITERS = 20


def make_result(clips_per_sec: float) -> dict:
    """The driver-facing JSON record (schema-tested in
    tests/test_bench_schema.py — the driver parses this line every
    round)."""
    return {
        "metric": "cremad_dgl_train_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC, 3),
        # honesty labels (VERDICT r1 item 7): the anchor is an ESTIMATE —
        # the reference records no throughput anywhere (SURVEY §6)
        "baseline_kind": "estimate",
        "baseline_clips_per_sec": REFERENCE_CLIPS_PER_SEC,
        "torch_cpu_floor_clips_per_sec": TORCH_CPU_FLOOR_CLIPS_PER_SEC,
        "vs_torch_cpu_floor": round(
            clips_per_sec / TORCH_CPU_FLOOR_CLIPS_PER_SEC, 1),
    }


def main(_retry: bool = True):
    from gdl_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()  # persistent XLA cache: repeat runs skip recompiles
    import jax
    import jax.numpy as jnp

    from gdl_tpu.config import Config
    from gdl_tpu.data.preprocess import make_train_preprocess
    from gdl_tpu.data.synthetic import synthetic_batch
    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.dgl import create_train_state, make_dgl_train_step
    from gdl_tpu.train.optim import make_optimizer

    cfg = Config(dataset="CREMAD", fusion_method="concat", modality="full",
                 fps=1, batch_size=BATCH, learning_rate=2e-3, alpha=5.0,
                 modulation="Normal", compute_dtype="bfloat16",
                 log_grad_csv=False)
    model = AVClassifierDGL(config=cfg, dtype=jnp.bfloat16)
    optimizer = make_optimizer(cfg, steps_per_epoch=104)  # 6698 // 64
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, optimizer)

    preprocess = make_train_preprocess(cfg)
    train_step = jax.jit(
        make_dgl_train_step(model, cfg, optimizer, preprocess=preprocess,
                            base_rng=rng),
        donate_argnums=(0,))

    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, BATCH, seed=1).items()}

    for _ in range(WARMUP):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    clips_per_sec = BATCH * ITERS / dt
    out = make_result(clips_per_sec)
    flops = _flops_per_step(train_step, state, batch)
    peak = _peak_flops(jax.devices()[0])
    if flops:
        out["model_flops_per_step"] = round(flops)
        out["model_tflops_per_sec"] = round(flops * ITERS / dt / 1e12, 2)
        if peak:
            out["mfu"] = round(flops * ITERS / dt / peak, 4)
            out["peak_flops_assumed"] = peak
    print(json.dumps(out))


def _flops_per_step(train_step, state, batch):
    """XLA's own cost model for the compiled step (fwd+bwd+optimizer,
    preprocessing included)."""
    try:
        ca = train_step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _peak_flops(device) -> float:
    """Per-chip peak bf16 FLOPs/s by device kind (public spec sheets)."""
    kind = getattr(device, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v6" in kind or "trillium" in kind:
        return 918e12
    if "v4" in kind:
        return 275e12
    return 0.0


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:  # transient tunnel contention — retry once
        if "initialize backend" in str(e):
            import time as _t

            _t.sleep(30)
            main()
        else:
            raise
