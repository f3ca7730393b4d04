"""Driver CLI surface: argparse wiring, flag parity, and config plumbing
(subprocess --help smoke keeps import errors out of the entry points —
the reference itself shipped with a broken main.py import, SURVEY §0)."""

import subprocess
import sys

import pytest

from gdl_tpu.config import Config, add_arguments, from_args
import argparse


@pytest.mark.parametrize("driver", ["main_dgl.py", "main.py", "valid.py",
                                    "main_intermediate.py"])
def test_driver_help_exits_clean(driver):
    out = subprocess.run([sys.executable, driver, "--help"],
                         capture_output=True, text=True, timeout=120,
                         cwd=".")
    assert out.returncode == 0, out.stderr
    assert "--ckpt_path" in out.stdout
    assert "--fusion_method" in out.stdout


def test_dgl_flag_surface_matches_reference():
    """main_dgl.py:24-65's 24 flags all present with matching defaults."""
    parser = argparse.ArgumentParser()
    add_arguments(parser, dgl=True)
    ns = parser.parse_args(["--ckpt_path", "x"])
    assert ns.dataset == "CREMAD"
    assert ns.modulation == "OGM_GE"
    assert ns.fusion_method == "concat"
    assert ns.fps == 1
    assert ns.use_video_frames == 3
    assert ns.num_frame == 1
    assert ns.batch_size == 64
    assert ns.epochs == 100
    assert ns.optimizer == "sgd"
    assert ns.learning_rate == 0.001
    assert ns.lr_decay_step == "[70]"
    assert ns.lr_decay_ratio == 0.1
    assert ns.modulation_starts == 0
    assert ns.modulation_ends == 50
    assert ns.alpha == 4.0
    assert ns.train is False
    assert ns.random_seed == 0
    assert ns.modality == "full"
    assert ns.backbone == "resnet"
    assert ns.total_epoch == 10
    assert ns.drop == 0
    cfg = from_args(ns)
    assert cfg.lr_decay_step == [70]  # eval()'d string (main.py:513)


def test_joint_flag_surface():
    """main.py:27-74 extras (pe/max/beta/pretrain/warmup/gamma) + the
    required --alpha."""
    parser = argparse.ArgumentParser()
    add_arguments(parser, dgl=False)
    ns = parser.parse_args(["--ckpt_path", "x", "--alpha", "0.8"])
    assert ns.learning_rate == 0.002
    assert ns.lr_decay_step == "[30,70]"
    assert ns.pe == 0
    assert ns.beta == 0.0
    assert ns.gamma == 1.0
    assert ns.warmup is False
    cfg = from_args(ns)
    assert cfg.alpha == 0.8
    assert cfg.lr_decay_step == [30, 70]


def test_n_classes_table():
    """models/basic_model.py:15-26."""
    for ds, n in [("VGGSound", 309), ("KineticSound", 34),
                  ("kinect400", 400), ("CREMAD", 6), ("AVE", 28)]:
        assert Config(dataset=ds).n_classes == n
    with pytest.raises(NotImplementedError):
        Config(dataset="bogus").n_classes
