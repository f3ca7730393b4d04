#!/usr/bin/env python
"""Hardware A/B: maxpool-backward lowerings at the flagship stem shapes.

XLA's select-and-scatter is the last named multi-ms op family on the
ResNet flagship profile (1.73 ms/step across the two stems, 6.9-7.7%).
Arms, at the real [64,112,112,64] and [64,129,94,64] bf16 shapes:
  sas         — plain nn.max_pool autodiff (select-and-scatter), shipping
  scatterfree — 9 compare passes + strided .at[].add (recorded round-2
                NEGATIVE: lowers to real scatters)
  padbwd      — 9 compare passes + interior-padded dilation pads (no
                scatter HLO; the candidate)
Each arm times fwd+bwd chained inside one jit (x carries the dependency).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(pool, shape, iters=30):
    import jax
    import jax.numpy as jnp

    x0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    b, h, w, c = shape
    ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    g = jax.random.normal(jax.random.PRNGKey(1), (b, ho, wo, c),
                          jnp.bfloat16)

    @jax.jit
    def many(x):
        def body(_, x):
            dx = jax.vjp(pool, x)[1](g)[0]
            return x + dx.astype(x.dtype) * jnp.asarray(1e-8, x.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    r = many(x0)
    float(r.reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = many(x0)
        float(r.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    from gdl_tpu.utils.compilation_cache import enable
    enable()
    from flax import linen as nn

    from gdl_tpu.models import layers as L
    from gdl_tpu.ops.maxpool import max_pool_3x3_s2_pallas

    def sas(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    arms = {"sas": sas, "pallas": max_pool_3x3_s2_pallas}
    if "--all" in sys.argv:  # the recorded XLA-rewrite negatives
        arms.update(scatterfree=L.max_pool_3x3_s2_scatterfree,
                    padbwd=L.max_pool_3x3_s2_padbwd)
    shapes = {"visual_stem": (64, 112, 112, 64),
              "audio_stem": (64, 129, 94, 64)}
    for sname, shape in shapes.items():
        for aname, fn in arms.items():
            ms = measure(fn, shape)
            print(json.dumps({"shape": sname, "arm": aname,
                              "ms_per_iter": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
