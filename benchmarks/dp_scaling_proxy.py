#!/usr/bin/env python
"""dp=1/2/4/8 CPU-mesh scaling proxy (VERDICT round-2 item 7).

No multi-chip hardware exists in this image, so this measures the closest
available statement about data-parallel efficiency: the tiny DGL train
step compiled over 1/2/4/8 VIRTUAL CPU devices at fixed GLOBAL batch.
One physical core executes every virtual device serially, so perfect
sharding would hold step time CONSTANT as dp grows (same total FLOPs);
any growth is the cost of the inserted collectives + partitioning
overhead — the quantity that would ride ICI on real chips.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/dp_scaling_proxy.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        state_sharding,
    )
    from gdl_tpu.train.dgl import create_train_state, make_dgl_train_step
    from gdl_tpu.train.optim import make_optimizer

    results = []
    for dp in (1, 2, 4, 8):
        cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=4.0,
                     dp=dp, mp=1, encoder_width=8,
                     encoder_stages=[1, 1, 1, 1], fps=1, log_grad_csv=False)
        model = AVClassifierDGL(config=cfg)
        optimizer = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   optimizer, frames=1, image_size=32)
        mesh = make_mesh(dp, 1, devices=jax.devices()[:dp])
        state = jax.device_put(state, state_sharding(state, mesh))
        r = jax.random.PRNGKey(5)
        ra, rv, rl = jax.random.split(r, 3)
        batch = {
            "audio": jax.random.normal(ra, (64, 33, 20, 1)),
            "visual": jax.random.normal(rv, (64, 1, 32, 32, 3)),
            "label": jax.random.randint(rl, (64,), 0, 6),
        }
        batch = {k: jax.device_put(v, batch_sharding(mesh))
                 for k, v in batch.items()}
        step = jax.jit(make_dgl_train_step(model, cfg, optimizer),
                       donate_argnums=(0,))
        for _ in range(3):
            state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        ms = (time.perf_counter() - t0) / iters * 1e3
        results.append((dp, ms))
        print(f"dp={dp}: {ms:.1f} ms/step (global batch 64)")

    base = results[0][1]
    print("\n| dp | ms/step | overhead vs dp=1 |")
    print("|---|---|---|")
    for dp, ms in results:
        print(f"| {dp} | {ms:.1f} | {ms / base:.2f}x |")
    print("\n(1 physical core executes the virtual devices serially; "
          "constant time == perfect sharding, growth == "
          "collective/partitioning overhead)")


if __name__ == "__main__":
    main()
