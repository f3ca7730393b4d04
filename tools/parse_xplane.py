#!/usr/bin/env python
"""Offline TPU-profile analyzer: xplane.pb -> per-op-category time table.

The tracing side is built in (--profile_dir on every driver, or
jax.profiler.trace); this parses the captured trace WITHOUT a TensorBoard
UI (none on this host — and the installed tensorboard_plugin_profile's
native converter is incompatible with the env, so we read the XSpace
proto directly).

    python tools/parse_xplane.py <trace_dir_or_xplane.pb> [--steps N] [--top K]

Prints the XLA-op category table (fusion/conv/copy/reshape/...) and the
top individual ops — the view that localized the Swin step's 34%%
layout-copy overhead and the ResNet stem costs (benchmarks/RESULTS.md).
"""

import argparse
import glob
import os
import re
import sys
from collections import defaultdict


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no *.xplane.pb under {path}")
    return hits[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--steps", type=int, default=1,
                    help="steps traced (divides totals into ms/step)")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

    xs = xplane_pb2.XSpace()
    with open(find_xplane(args.path), "rb") as f:
        xs.ParseFromString(f.read())
    tpus = [p for p in xs.planes
            if p.name.startswith("/device:TPU") and p.lines]
    if not tpus:
        sys.exit("no TPU device plane in trace (CPU-only run?)")
    for tpu in tpus:
        md = tpu.event_metadata
        op_lines = [l for l in tpu.lines if l.name == "XLA Ops"]
        if not op_lines:
            continue
        cat = defaultdict(float)
        cnt = defaultdict(int)
        tops = defaultdict(float)
        for ev in op_lines[0].events:
            name = md[ev.metadata_id].name
            m = re.match(r"%([a-zA-Z\-_]+)", name)
            k = m.group(1).rstrip("0123456789.") if m else "?"
            if "fusion" in k and "conv" in name:
                k = "fusion(conv)"
            cat[k] += ev.duration_ps
            cnt[k] += 1
            tops[name[:110]] += ev.duration_ps
        total = sum(cat.values())
        print(f"== {tpu.name}: {total / 1e9 / args.steps:.2f} ms/step ==")
        for k, t in sorted(cat.items(), key=lambda kv: -kv[1])[:15]:
            print(f"{t / 1e9 / args.steps:8.2f} ms {100 * t / total:5.1f}%"
                  f"  n={cnt[k]:6d}  {k}")
        print("-- top ops --")
        for name, t in sorted(tops.items(), key=lambda kv: -kv[1])[:args.top]:
            print(f"{t / 1e9 / args.steps:7.3f} ms  {name}")


if __name__ == "__main__":
    main()
