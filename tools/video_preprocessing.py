#!/usr/bin/env python
"""Offline video → 1-FPS JPEG frame extraction (L0 data preparation).

Capability parity with the reference's run-once scripts
(data/CREMAD/video_preprocessing.py:50-76 and the KS/VGGSound variants):
walk the raw video files (.flv/.mp4), keep `frames_per_second` frames per
second of video, and write `Image-{fps:02d}-FPS/<clip>/<count>.jpg` trees —
the exact directory layout the dataset loaders consume (SURVEY §1 L0).

The reference uses OpenCV; this image has no cv2, so frames are extracted
with ffmpeg (present on most hosts; the script exits with a clear message
otherwise).

  python tools/video_preprocessing.py --dataset_path /data/CREMA-D \
      --video_dir VideoFlash --fps 1
"""

import argparse
import os
import shutil
import subprocess
import sys

VIDEO_EXTS = (".flv", ".mp4", ".avi", ".mkv", ".webm")


def extract_clip(video_path: str, save_dir: str, fps: int) -> bool:
    os.makedirs(save_dir, exist_ok=True)
    cmd = [
        "ffmpeg", "-nostdin", "-loglevel", "error", "-i", video_path,
        "-vf", f"fps={fps}", "-q:v", "2",
        os.path.join(save_dir, "%05d.jpg"),
    ]
    return subprocess.run(cmd, check=False).returncode == 0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--video_dir", default="VideoFlash",
                        help="subdirectory with raw clips")
    parser.add_argument("--fps", default=1, type=int,
                        help="frames kept per second")
    parser.add_argument("--out_dir", default=None,
                        help="default: <dataset_path>/Image-{fps:02d}-FPS")
    args = parser.parse_args()

    if shutil.which("ffmpeg") is None:
        sys.exit("ffmpeg not found on PATH — install it to extract frames "
                 "(the reference used OpenCV for the same task)")

    video_root = os.path.join(args.dataset_path, args.video_dir)
    out_root = args.out_dir or os.path.join(
        args.dataset_path, "Image-{:02d}-FPS".format(args.fps))
    os.makedirs(out_root, exist_ok=True)

    count = ok = 0
    for dirpath, _, files in os.walk(video_root):
        for name in sorted(files):
            if not name.lower().endswith(VIDEO_EXTS):
                continue
            clip = os.path.splitext(name)[0]
            rel = os.path.relpath(dirpath, video_root)
            save_dir = os.path.join(out_root, rel, clip) if rel != "." \
                else os.path.join(out_root, clip)
            print("Processing {} ...".format(clip))
            count += 1
            ok += extract_clip(os.path.join(dirpath, name), save_dir,
                               args.fps)
    print(f"done: {ok}/{count} clips extracted → {out_root}")


if __name__ == "__main__":
    main()
