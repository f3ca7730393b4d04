#!/usr/bin/env python
"""Offline video → 16 kHz mono WAV extraction (L0 data preparation).

Capability parity with data/KineticSound/mp4_to_wav.py:71: ffmpeg to
pcm_s16le at 16 kHz, preserving the class-directory layout, skipping
already-extracted files.

  python tools/mp4_to_wav.py --video_root /data/ks/visual/train \
      --audio_root /data/ks/audio/train [--sample_rate 16000]
"""

import argparse
import os
import shutil
import subprocess
import sys

VIDEO_EXTS = (".mp4", ".flv", ".avi", ".mkv", ".webm")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_root", required=True)
    parser.add_argument("--audio_root", required=True)
    parser.add_argument("--sample_rate", default=16000, type=int)
    args = parser.parse_args()

    if shutil.which("ffmpeg") is None:
        sys.exit("ffmpeg not found on PATH — required for audio extraction")

    count = ok = 0
    for dirpath, _, files in os.walk(args.video_root):
        for name in sorted(files):
            if not name.lower().endswith(VIDEO_EXTS):
                continue
            rel = os.path.relpath(dirpath, args.video_root)
            out_dir = os.path.join(args.audio_root, rel) if rel != "." \
                else args.audio_root
            os.makedirs(out_dir, exist_ok=True)
            wav_path = os.path.join(
                out_dir, os.path.splitext(name)[0] + ".wav")
            if os.path.exists(wav_path):
                continue
            count += 1
            cmd = ["ffmpeg", "-nostdin", "-loglevel", "error",
                   "-i", os.path.join(dirpath, name),
                   "-acodec", "pcm_s16le", "-ar", str(args.sample_rate),
                   "-ac", "1", wav_path]
            ok += subprocess.run(cmd, check=False).returncode == 0
    print(f"done: {ok}/{count} wavs extracted → {args.audio_root}")


if __name__ == "__main__":
    main()
