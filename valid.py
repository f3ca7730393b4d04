#!/usr/bin/env python
"""Standalone checkpoint evaluator — parity with the reference valid.py:
rebuild AVClassifier_DGL, load a saved checkpoint (strict=False semantics,
valid.py:148), run the per-class accuracy accounting over the test split.

    python valid.py --ckpt_path <file.pth> --dataset CREMAD ...
"""

import argparse

import jax.numpy as jnp

from gdl_tpu.config import add_arguments, from_args
from gdl_tpu.parallel.distributed import maybe_initialize
from gdl_tpu.data.datasets import make_dataset
from gdl_tpu.models.classifier import AVClassifierDGL
from gdl_tpu.train.loop import run_eval


def get_arguments():
    parser = argparse.ArgumentParser()
    add_arguments(parser, dgl=True)
    return parser.parse_args()


def modal_main():
    maybe_initialize()  # multi-host: no-op unless a coordinator is set
    args = get_arguments()
    cfg = from_args(args)
    print(cfg)
    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    model = AVClassifierDGL(config=cfg, dtype=dtype)
    test_set = make_dataset(cfg, "test")
    return run_eval(cfg, model, test_set, cfg.ckpt_path, dgl=True)


if __name__ == "__main__":
    modal_main()
