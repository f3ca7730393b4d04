"""Multi-host preemption agreement (utils/preempt.py:92-102, VERDICT r4
item 3): exactly ONE host receives the stop signal mid-epoch; both hosts
must stop at the same sync_every boundary (no survivor hang in the next
collective), the resume state must record that agreed step, and the
resumed 2-process run must match the uninterrupted 2-process run bitwise.

Also covers the ADVICE-r4 epoch-end agreement: a flag raised inside the
final partial sync_every window (sync_every larger than the epoch) stops
at the epoch boundary BEFORE eval instead of deferring a whole epoch.

Mechanics mirror tests/test_multihost.py: two localhost processes under
jax.distributed, each with 2 virtual CPU devices, driven phase-by-phase
through the REAL run_training loop. All phases share one persistent XLA
compilation cache so only the first pays the 1-core compile."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from flax import serialization

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["GDL_PLATFORM"] = "cpu"
    sys.path.insert(0, '@REPO@')
    import gdl_tpu  # applies GDL_PLATFORM before backend init
    from gdl_tpu.utils.compilation_cache import enable
    enable('@CACHE@')  # phases share compiled programs (1-core host)
    import jax
    jax.distributed.initialize(coordinator_address='@ADDR@',
                               num_processes=2,
                               process_id=int(sys.argv[2]))

    from gdl_tpu.config import Config
    from gdl_tpu.data.synthetic import SyntheticDataset
    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.loop import run_training
    from gdl_tpu.utils.preempt import PreemptionGuard

    phase, pid = sys.argv[1], int(sys.argv[2])
    assert jax.process_count() == 2

    cfg = Config(dataset="CREMAD", fusion_method="concat",
                 modulation="Normal", alpha=4.0, fps=2, batch_size=4,
                 dp=4, epochs=2, learning_rate=0.01, lr_decay_step=[70],
                 ckpt_path='@ROOT@/' + phase.split('_resume')[0],
                 train=True, encoder_width=8, encoder_stages=[1, 1, 1, 1],
                 num_workers=2, log_grad_csv=False, random_seed=0,
                 save_every=1, eval_drop_last=1)
    if phase.endswith('_resume'):
        cfg.resume = cfg.ckpt_path + '/resume_state.msgpack'
        cfg.ckpt_path = '@ROOT@/' + phase

    # 16 train samples / global batch 4 -> 4 steps per epoch
    train_set = SyntheticDataset(cfg, size=16, seed=0)
    test_set = SyntheticDataset(cfg, size=8, seed=100)

    if phase == 'pre':
        # mid-window: host 0 flags after ITS local step-2 check;
        # agreement boundary every 2 steps -> both stop at step 2
        guard = PreemptionGuard(sync_every=2,
                                trigger_after=2 if pid == 0 else None)
    elif phase == 'pre_end':
        # final-partial-window: no boundary inside the 4-step epoch;
        # host 1 flags at step 3 -> the EPOCH-END agreement must stop
        # both hosts before eval (ADVICE r4)
        guard = PreemptionGuard(sync_every=1000,
                                trigger_after=3 if pid == 1 else None)
    else:  # cont / *_resume: a guard that never fires
        guard = PreemptionGuard(sync_every=2)

    run_training(cfg, AVClassifierDGL(config=cfg), train_set, test_set,
                 dgl=True, preempt_guard=guard)
    print("PHASE", phase, "PROC", pid, "DONE", flush=True)
""")


def _run_phase(script, phase, env, root):
    procs = [subprocess.Popen([sys.executable, str(script), phase, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True, env=env,
                              cwd=root)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, (phase, err[-3000:])
        assert f"PHASE {phase}" in out, (phase, out[-2000:])
        outs.append(out)
    return outs


def _load_state(root, sub):
    with open(os.path.join(root, sub, "resume_state.msgpack"), "rb") as f:
        return serialization.msgpack_restore(f.read())


def _assert_bitwise_equal(sa, sb):
    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(sa["state"])
    flat_b = jax.tree_util.tree_leaves_with_path(sb["state"])
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))


@pytest.mark.slow
def test_multihost_preempt_agreement_and_bitwise_resume(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    root = str(tmp_path)
    script = tmp_path / "preempt_worker.py"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)

    def write_script(port_):
        script.write_text(WORKER.replace("@REPO@", REPO_ROOT)
                          .replace("@ADDR@", f"localhost:{port_}")
                          .replace("@ROOT@", root)
                          .replace("@CACHE@", os.path.join(root, "xlacache")))

    # ground truth: 2 uninterrupted epochs across 2 hosts
    write_script(port)
    _run_phase(script, "cont", env, root)
    cont = _load_state(root, "cont")
    assert cont["epoch"] == 2

    # one host (proc 0) flagged mid-epoch; both must stop at the agreed
    # sync_every=2 boundary — step 2 of the 4-step epoch 0
    for phase in ["pre", "pre_resume"]:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        write_script(port)
        outs = _run_phase(script, phase, env, root)
        if phase == "pre":
            saved = _load_state(root, "pre")
            assert saved["epoch"] == 0
            assert saved["extra"]["step_in_epoch"] == 2
            # BOTH hosts reached the same stop (process 1 had no local
            # flag — it stopped via the allgather agreement)
            for out in outs:
                assert "Preempted at epoch 0 step 2" in out, out[-2000:]
    _assert_bitwise_equal(cont, _load_state(root, "pre_resume"))

    # flag raised in the final partial window (sync_every=1000 > epoch):
    # the epoch-end agreement stops both hosts at the epoch boundary,
    # before eval, instead of deferring past a full extra epoch
    for phase in ["pre_end", "pre_end_resume"]:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        write_script(port)
        outs = _run_phase(script, phase, env, root)
        if phase == "pre_end":
            saved = _load_state(root, "pre_end")
            assert saved["epoch"] == 1  # epoch 0's training completed
            assert saved["extra"]["step_in_epoch"] == 0
            for out in outs:
                assert "Preempted at epoch 0 step 4" in out, out[-2000:]
    _assert_bitwise_equal(cont, _load_state(root, "pre_end_resume"))
