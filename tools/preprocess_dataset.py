#!/usr/bin/env python
"""Build the offline-decoded cache the datasets consume via
`--preprocessed_path` — the host-pipeline lever for decode/resample-bound
training (KS shapes measure ~90 clips/s/core decoded live, dominated by
the 44.1->16 kHz polyphase resample; a cached epoch skips decode AND
resample entirely while staying sample-for-sample identical,
tests/test_preprocessed.py).

Per clip it stores:
  <out>/audio/<sha1(path)>_<base>.npy   — the RESAMPLED f32 waveform
      (gdl_tpu.data.wav.load_wav output, the pure-Python reference
      numerics; the per-epoch tile/random-crop tail still runs at load)
  <out>/frames/<sha1(dir)>_<base>.npy   — EVERY frame of the clip decoded
      to the 256^2 canonical uint8 canvas ([n,256,256,3]; read back
      memory-mapped so only the selected frames touch disk) plus a
      .names.npy sidecar with the sorted entry names so the per-epoch
      random frame selection draws the same indices as the live path.

Usage:
  python tools/preprocess_dataset.py --dataset CREMAD \
      --audio_path .../AudioWAV --visual_path ... --out /data/cremad_pre \
      [--mode both] [--workers 8]

Replaces nothing in the reference (it has no offline path — SURVEY §3.5
runs librosa+PIL in 32 DataLoader workers every epoch).
"""

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdl_tpu.config import Config  # noqa: E402
from gdl_tpu.data import cache as cache_writers  # noqa: E402
from gdl_tpu.data.datasets import (  # noqa: E402
    make_dataset,
    preprocessed_audio_file,
    preprocessed_frames_file,
)


# single-clip writers live in gdl_tpu.data.cache (shared with the
# on-the-fly --preprocessed_write path); kept under the old names for
# this tool's callers/tests
_write_audio = cache_writers.write_audio
_write_frames = cache_writers.write_frames


def preprocess(cfg: Config, out_root: str, modes=("train", "test"),
               workers: int = 4, datasets=None) -> int:
    """Decode every (audio, video_dir) pair of the given modes into
    out_root. Idempotent (existing files skipped); returns the clip
    count processed. `datasets` overrides the make_dataset dispatch
    (tests pass fixture-rooted instances)."""
    if datasets is None:
        datasets = [make_dataset(cfg, mode) for mode in modes]
    pairs = {}
    for ds in datasets:
        for a, v in zip(ds.audio, ds.image):
            pairs[(a, v)] = None
    jobs = []
    with ThreadPoolExecutor(max_workers=workers) as ex:
        for a, v in pairs:
            jobs.append(ex.submit(
                _write_audio, a, cfg.dataset,
                preprocessed_audio_file(out_root, a)))
            jobs.append(ex.submit(
                _write_frames, v, preprocessed_frames_file(out_root, v)))
        for j in jobs:
            j.result()
    return len(pairs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="CREMAD")
    ap.add_argument("--audio_path", required=True)
    ap.add_argument("--visual_path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", default="both",
                    choices=["train", "test", "both"])
    ap.add_argument("--workers", default=4, type=int)
    ap.add_argument("--use_video_frames", default=3, type=int)
    args = ap.parse_args()
    cfg = Config(dataset=args.dataset, audio_path=args.audio_path,
                 visual_path=args.visual_path,
                 use_video_frames=args.use_video_frames)
    modes = ("train", "test") if args.mode == "both" else (args.mode,)
    n = preprocess(cfg, args.out, modes, args.workers)
    print(f"preprocessed {n} clips -> {args.out}")


if __name__ == "__main__":
    main()
