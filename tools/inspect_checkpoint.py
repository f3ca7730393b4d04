#!/usr/bin/env python
"""Checkpoint inspection — the working replacement for the reference's
grammar_test.py weight-slicing probe (grammar_test.py:61-87: per-modality
|fc_out| weight magnitudes), runnable on our legacy-schema checkpoints.

  python tools/inspect_checkpoint.py <best_model_*.pth> [--encoder_dim 512]
"""

import argparse
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt")
    parser.add_argument("--encoder_dim", type=int, default=512)
    args = parser.parse_args()

    from flax import serialization

    with open(args.ckpt, "rb") as f:
        loaded = serialization.msgpack_restore(f.read())
    print("saved_epoch:", loaded.get("saved_epoch"),
          " acc:", loaded.get("acc"),
          " fusion:", loaded.get("fusion"),
          " alpha:", loaded.get("alpha"))
    params = loaded["model"]["params"]
    fusion = params.get("fusion_module", {})
    d = args.encoder_dim
    for name, sub in fusion.items():
        kernel = sub.get("kernel")
        if kernel is None:
            continue
        k = np.asarray(kernel)
        print(f"{name}: kernel {k.shape} |w|={np.abs(k).mean():.5f}")
        if k.shape[0] == 2 * d:
            # the grammar_test probe: audio rows [0:d], visual rows [d:2d]
            print(f"  |audio half|  = {np.abs(k[:d]).mean():.5f}")
            print(f"  |visual half| = {np.abs(k[d:]).mean():.5f}")

    def count(tree):
        if isinstance(tree, dict):
            return sum(count(v) for v in tree.values())
        return np.asarray(tree).size

    for top, sub in params.items():
        print(f"{top}: {count(sub):,} params")


if __name__ == "__main__":
    sys.exit(main())
