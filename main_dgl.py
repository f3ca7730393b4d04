#!/usr/bin/env python
"""DGL training driver — CLI parity with the reference main_dgl.py.

    python main_dgl.py --train --ckpt_path ckpt --dataset CREMAD \
        --modulation Normal --fusion_method concat --alpha 5 \
        --learning_rate 2e-3 --epochs 100   # cramed_dgl.sh:8 recipe

Same flags (main_dgl.py:24-65), same stdout/CSV/checkpoint artifacts
(SURVEY §5.5, §3.6), TPU-native execution: one jit-compiled step (forward +
on-device preprocessing + single-backward DGL loss) data-parallel over a
jax.sharding.Mesh.
"""

import argparse

import jax.numpy as jnp

from gdl_tpu.config import add_arguments, from_args
from gdl_tpu.parallel.distributed import maybe_initialize
from gdl_tpu.data.datasets import make_dataset
from gdl_tpu.models.classifier import AVClassifierDGL, AVClassifierSwinDGL
from gdl_tpu.train.loop import run_eval, run_training


def get_arguments():
    parser = argparse.ArgumentParser()
    add_arguments(parser, dgl=True)
    return parser.parse_args()


def main():
    maybe_initialize()  # multi-host: no-op unless a coordinator is set
    args = get_arguments()
    from gdl_tpu.utils.compilation_cache import enable as _cc
    _cc(getattr(args, 'compilation_cache_dir', None))
    cfg = from_args(args)
    print(cfg)
    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)

    if cfg.backbone == "swin":
        if cfg.strict_compat:
            raise EOFError  # the reference's stub (main_dgl.py:239-240)
        model = AVClassifierSwinDGL(config=cfg, dtype=dtype)
    elif cfg.backbone == "resnet":
        model = AVClassifierDGL(config=cfg, dtype=dtype)
    else:
        raise EOFError  # main_dgl.py:239-240

    if cfg.train:
        train_set = make_dataset(cfg, "train")
        test_set = make_dataset(cfg, "test")
        run_training(cfg, model, train_set, test_set, dgl=True)
    else:
        test_set = make_dataset(cfg, "test")
        run_eval(cfg, model, test_set, cfg.ckpt_path, dgl=True)


if __name__ == "__main__":
    main()
