"""The real thing: `python main_dgl.py --train ...` as a subprocess over an
on-disk fixture tree — argparse → dataset → loader → jit train → eval →
CSV + checkpoint, exactly as a user would run it."""

import glob
import os
import subprocess
import sys

import pytest

from tests.test_datasets import make_cremad_tree

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_main_dgl_cli_end_to_end(tmp_path):
    names = [(f"clip{i}", lbl) for i, lbl in enumerate(
        ["NEU", "HAP", "SAD", "FEA", "DIS", "ANG"] * 2)]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    # CremadDataset reads ./dataset/data/CREMAD/*.csv relative to cwd
    os.makedirs(tmp_path / "dataset", exist_ok=True)
    os.symlink(data_root.rstrip("/"), tmp_path / "dataset" / "data")

    env = dict(os.environ,
               PYTHONPATH=REPO_ROOT + ":" + os.environ.get("PYTHONPATH", ""),
               GDL_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [sys.executable, os.path.join(REPO_ROOT, "main_dgl.py"),
           "--train", "--ckpt_path", str(tmp_path / "ckpt"),
           "--dataset", "CREMAD", "--modulation", "Normal",
           "--fusion_method", "concat", "--alpha", "4",
           "--audio_path", audio, "--visual_path", visual,
           "--batch_size", "8", "--epochs", "1", "--num_workers", "2",
           "--encoder_width", "8", "--encoder_stages", "1,1,1,1",
           "--learning_rate", "0.002"]
    out = subprocess.run(cmd, cwd=tmp_path, env=env, capture_output=True,
                         text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Start training" in out.stdout
    csv_path = tmp_path / "ckpt" / "CREMAD_full.csv"
    assert csv_path.exists()
    rows = csv_path.read_text().strip().splitlines()
    assert rows[0] == "1000,1000,1000" and len(rows) == 2
    # per-step grad CSV written in cwd (main_dgl.py:148-152 artifact)
    assert (tmp_path / "audio_visual_grad_vanilla.csv").exists()


@pytest.mark.slow
def test_main_dgl_cli_with_preprocessed_cache(tmp_path):
    """The production input-pipeline config: tools/preprocess_dataset.py
    builds the offline cache, then main_dgl.py --preprocessed_path trains
    through the Loader's native whole-batch collate (falling back
    gracefully wherever the cache or native lib is missing)."""
    names = [(f"clip{i}", lbl) for i, lbl in enumerate(
        ["NEU", "HAP", "SAD", "FEA", "DIS", "ANG"] * 2)]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    os.makedirs(tmp_path / "dataset", exist_ok=True)
    os.symlink(data_root.rstrip("/"), tmp_path / "dataset" / "data")

    env = dict(os.environ,
               PYTHONPATH=REPO_ROOT + ":" + os.environ.get("PYTHONPATH", ""),
               GDL_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    pre = str(tmp_path / "pre")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools",
                                      "preprocess_dataset.py"),
         "--dataset", "CREMAD", "--audio_path", audio,
         "--visual_path", visual, "--out", pre, "--workers", "2"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "preprocessed 12 clips" in out.stdout

    cmd = [sys.executable, os.path.join(REPO_ROOT, "main_dgl.py"),
           "--train", "--ckpt_path", str(tmp_path / "ckpt"),
           "--dataset", "CREMAD", "--modulation", "Normal",
           "--fusion_method", "concat", "--alpha", "4",
           "--audio_path", audio, "--visual_path", visual,
           "--preprocessed_path", pre,
           "--batch_size", "8", "--epochs", "1", "--num_workers", "2",
           "--encoder_width", "8", "--encoder_stages", "1,1,1,1",
           "--learning_rate", "0.002"]
    out = subprocess.run(cmd, cwd=tmp_path, env=env, capture_output=True,
                         text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Start training" in out.stdout
    assert (tmp_path / "ckpt" / "CREMAD_full.csv").exists()


@pytest.mark.slow
def test_main_dgl_cli_strict_compat(tmp_path):
    """--strict_compat end-to-end through the real driver: the host-exact
    visual path (dict samples with the host_exact marker) must flow
    through Loader collation and the device preprocess, and a configured
    --preprocessed_path must be BYPASSED (the canvas cache cannot
    reproduce host-exact pixels) rather than silently served."""
    names = [(f"clip{i}", lbl) for i, lbl in enumerate(
        ["NEU", "HAP", "SAD", "FEA", "DIS", "ANG"] * 2)]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    os.makedirs(tmp_path / "dataset", exist_ok=True)
    os.symlink(data_root.rstrip("/"), tmp_path / "dataset" / "data")

    env = dict(os.environ,
               PYTHONPATH=REPO_ROOT + ":" + os.environ.get("PYTHONPATH", ""),
               GDL_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [sys.executable, os.path.join(REPO_ROOT, "main_dgl.py"),
           "--train", "--ckpt_path", str(tmp_path / "ckpt"),
           "--dataset", "CREMAD", "--modulation", "Normal",
           "--fusion_method", "concat", "--alpha", "4",
           "--audio_path", audio, "--visual_path", visual,
           "--strict_compat",
           "--preprocessed_path", str(tmp_path / "nonexistent_cache"),
           "--batch_size", "8", "--epochs", "1", "--num_workers", "2",
           "--encoder_width", "8", "--encoder_stages", "1,1,1,1",
           "--learning_rate", "0.002"]
    out = subprocess.run(cmd, cwd=tmp_path, env=env, capture_output=True,
                         text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Start training" in out.stdout
    assert (tmp_path / "ckpt" / "CREMAD_full.csv").exists()
