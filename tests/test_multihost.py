"""True multi-process (multi-host-style) validation: two localhost
processes under jax.distributed, a global Mesh spanning both, and the DGL
loss computed over a globally-sharded batch — the reference's missing
multi-node story (SURVEY §2.9), exercised for real rather than simulated.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["GDL_PLATFORM"] = "cpu"
    sys.path.insert(0, '@REPO@')
    import gdl_tpu  # applies GDL_PLATFORM before backend init
    import jax
    jax.distributed.initialize(coordinator_address='@ADDR@',
                               num_processes=2,
                               process_id=int(sys.argv[1]))
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import mesh_utils

    from gdl_tpu.config import Config
    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.dgl import dgl_loss_fn

    assert jax.process_count() == 2

    cfg = Config(dataset="CREMAD", fusion_method="concat", alpha=4.0,
                 encoder_width=8, encoder_stages=[1, 1, 1, 1], fps=1)
    model = AVClassifierDGL(config=cfg)
    a = jnp.ones((2, 33, 20, 1))
    v = jnp.ones((2, 1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, a, v,
                           train=False)  # same seed -> same params per proc

    mesh = Mesh(mesh_utils.create_device_mesh((4,)), ("data",))
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def make_global(local_shards, global_shape):
        return jax.make_array_from_single_device_arrays(
            global_shape, sh,
            [jax.device_put(s, d) for s, d in
             zip(local_shards, jax.local_devices())])

    rng = np.random.default_rng(7)  # same data on both procs; each takes
    audio = rng.standard_normal((4, 33, 20, 1)).astype("float32")
    visual = rng.standard_normal((4, 1, 32, 32, 3)).astype("float32")
    label = rng.integers(0, 6, (4,)).astype("int32")
    pid = jax.process_index()
    # global batch 4: process p owns rows [2p, 2p+2), one per local device
    batch = {
        "audio": make_global([audio[2*pid+i:2*pid+i+1] for i in range(2)],
                             (4, 33, 20, 1)),
        "visual": make_global([visual[2*pid+i:2*pid+i+1] for i in range(2)],
                              (4, 1, 32, 32, 3)),
        "label": make_global([label[2*pid+i:2*pid+i+1] for i in range(2)],
                             (4,)),
    }
    params = jax.device_put(variables["params"], rep)
    stats = jax.device_put(variables["batch_stats"], rep)

    loss = jax.jit(
        lambda p, s, b: dgl_loss_fn(model, p, s, b, cfg, train=False)[0],
        out_shardings=rep)(params, stats, batch)
    val = float(jax.device_get(loss))
    assert np.isfinite(val)
    print("PROC", jax.process_index(), "LOSS", f"{val:.6f}", flush=True)
""")


@pytest.mark.slow
def test_two_process_global_mesh_dgl_loss(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@REPO@", "/root/repo")
                      .replace("@ADDR@", f"localhost:{port}"))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    losses = set()
    for out in outs:
        for line in out.splitlines():
            if line.startswith("PROC"):
                losses.add(line.split("LOSS")[1].strip())
    # both processes computed the same global loss
    assert len(losses) == 1, outs
