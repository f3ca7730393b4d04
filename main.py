#!/usr/bin/env python
"""Joint training driver — CLI parity with the reference main.py
(baseline / OGM-GE lineage, PE + KL regularizer, diversity diagnostics).

Note the shipped reference's quirks, reproduced or improved deliberately:
  - its --modulation flag is a no-op (main.py:261-332, spec commented out);
    here OGM/OGM_GE are LIVE unless --strict_compat
  - its checkpoint save is commented out (main.py:653); here best-acc
    checkpoints are saved like the DGL driver's
"""

import argparse

import jax.numpy as jnp

from gdl_tpu.config import add_arguments, from_args
from gdl_tpu.parallel.distributed import maybe_initialize
from gdl_tpu.data.datasets import make_dataset
from gdl_tpu.models.classifier import AVClassifier, AVClassifierSwin
from gdl_tpu.train.loop import run_eval, run_training


def get_arguments():
    parser = argparse.ArgumentParser()
    add_arguments(parser, dgl=False)
    parser.add_argument("--export_path", default=None, type=str,
                        help="eval mode only: also write an AOT serving "
                             "artifact of the joint model's eval forward "
                             "(the valid.py --export_path equivalent for "
                             "this lineage)")
    parser.add_argument("--export_poly_batch", default=0, type=int,
                        help="1 = export a symbolic batch dimension (one "
                             "artifact serves any batch size)")
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

    # backbone dispatch (main.py:496-501)
    if cfg.backbone == "swin":
        model = AVClassifierSwin(config=cfg, dtype=dtype)
    else:
        model = AVClassifier(config=cfg, dtype=dtype)

    if cfg.train:
        train_set = make_dataset(cfg, "train")
        test_set = make_dataset(cfg, "test")
        run_training(cfg, model, train_set, test_set, dgl=False)
    else:
        test_set = make_dataset(cfg, "test")
        run_eval(cfg, model, test_set, cfg.ckpt_path, dgl=False)
        if args.export_path:
            from gdl_tpu.serve import export_from_checkpoint

            export_from_checkpoint(
                cfg, cfg.ckpt_path, args.export_path, dgl=False,
                poly_batch=bool(args.export_poly_batch))
            print("Serving artifact written to", args.export_path)


if __name__ == "__main__":
    main()
