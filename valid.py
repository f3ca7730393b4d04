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
    parser.add_argument("--export_path", default=None, type=str,
                        help="also write an AOT serving artifact "
                             "(jax.export StableHLO, weights baked in)")
    parser.add_argument("--export_poly_batch", default=0, type=int,
                        help="1 = export a symbolic batch dimension (one "
                             "artifact serves any batch size; forces the "
                             "XLA eval path — Pallas kernels need static "
                             "shapes). 0 = pin the config batch size")
    return parser.parse_args()


def modal_main():
    maybe_initialize()  # multi-host: no-op unless a coordinator is set
    args = get_arguments()
    from gdl_tpu.utils.compilation_cache import enable as _cc
    _cc(getattr(args, 'compilation_cache_dir', None))
    cfg = from_args(args)
    print(cfg)
    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    model = AVClassifierDGL(config=cfg, dtype=dtype)
    test_set = make_dataset(cfg, "test")
    result = run_eval(cfg, model, test_set, cfg.ckpt_path, dgl=True)
    if args.export_path:
        from gdl_tpu.serve import export_from_checkpoint

        export_from_checkpoint(cfg, cfg.ckpt_path, args.export_path,
                               poly_batch=bool(args.export_poly_batch))
        print("Serving artifact written to", args.export_path)
    return result


if __name__ == "__main__":
    modal_main()
