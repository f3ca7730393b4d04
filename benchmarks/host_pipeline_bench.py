#!/usr/bin/env python
"""Host input-pipeline throughput at rate (VERDICT round-2 item 2).

The reference's dominant cost was host decode (SURVEY §3.5: librosa + PIL
across 32 DataLoader workers); every repo benchmark so far fed the device
synthetic batches. This one runs the REAL Loader + dataset classes over a
generated on-disk fixture tree with realistic payloads and reports host
clips/s at 1..N worker threads, for CREMA-D and Kinetics-Sounds shapes,
with the native (C++/libjpeg) paths on or off:

    python benchmarks/host_pipeline_bench.py [--dataset CREMAD|KS]
        [--clips 96] [--workers 1 2 4 8] [--native-jpeg] [--with-step]

--with-step additionally consumes the loader from the REAL jitted bs64
DGL train step (TPU): end-to-end clips/s where the device competes with
the host for cycles — the number that tells you how many host cores one
chip needs (reference hot loop: dataset/CramedDataset.py:57-103).
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _write_wav(path, seconds, sr=22050, seed=0):
    from scipy.io import wavfile

    rs = np.random.RandomState(seed)
    wavfile.write(str(path), sr,
                  (rs.randn(int(sr * seconds)) * 3000).astype(np.int16))


def _write_jpgs(dirpath, n, w=480, h=360, seed=0):
    from PIL import Image

    os.makedirs(dirpath, exist_ok=True)
    rs = np.random.RandomState(seed)
    # low-frequency content so the JPEGs have realistic entropy/size
    base = rs.randint(0, 255, (h // 8, w // 8, 3), np.uint8)
    img = np.asarray(Image.fromarray(base).resize((w, h)))
    for i in range(n):
        arr = np.clip(img.astype(np.int16)
                      + rs.randint(-20, 20, img.shape), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(
            os.path.join(dirpath, f"frame_{i:05d}.jpg"), quality=85)


def build_cremad_fixture(root, n_clips, fps):
    """CREMA-D shapes: ~3 s 22050 Hz speech wav + fps frames per clip."""
    import csv

    labels = ["NEU", "HAP", "SAD", "FEA", "DIS", "ANG"]
    audio = os.path.join(root, "audio")
    visual = os.path.join(root, "visual")
    meta = os.path.join(root, "meta", "CREMAD")
    os.makedirs(audio, exist_ok=True)
    os.makedirs(meta, exist_ok=True)
    names = [(f"clip{i:04d}", labels[i % 6]) for i in range(n_clips)]
    for split in ("train", "test"):
        with open(os.path.join(meta, f"{split}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            for name, label in names:
                w.writerow([name, label])
    for i, (name, _) in enumerate(names):
        _write_wav(os.path.join(audio, f"{name}.wav"), 3.0, seed=i)
        _write_jpgs(os.path.join(visual, f"Image-{fps:02d}-FPS", name),
                    n=3, seed=i)
    return audio, visual, os.path.join(root, "meta") + "/"


def build_ks_fixture(root, n_clips):
    """Kinetics-Sounds shapes: ~10 s wav + >=3 frames, per-class dirs."""
    data = os.path.join(root, "ks")
    class_file = os.path.join(root, "class.txt")
    classes = ["alpha", "beta", "gamma", "delta"]
    with open(class_file, "w") as f:
        f.write(",".join(classes))
    per_class = -(-n_clips // len(classes))
    i = 0
    for cname in classes:
        vroot = os.path.join(data, "visual", "train_img/Image-01-FPS",
                             cname)
        aroot = os.path.join(data, "audio", "train", cname)
        os.makedirs(aroot, exist_ok=True)
        for k in range(per_class):
            vid = f"vid{i:04d}"
            _write_jpgs(os.path.join(vroot, vid), n=4, seed=i)
            _write_wav(os.path.join(aroot, f"{vid}.wav"), 10.0, seed=i)
            i += 1
    return data, class_file


def _make_dataset(args, root):
    from gdl_tpu.config import Config

    if args.dataset == "CREMAD":
        from gdl_tpu.data.datasets import CremadDataset

        audio, visual, meta = build_cremad_fixture(root, args.clips,
                                                   fps=args.fps)
        cfg = Config(dataset="CREMAD", fps=args.fps, audio_path=audio,
                     visual_path=visual, batch_size=args.batch,
                     compute_dtype="bfloat16")
        return cfg, CremadDataset(cfg, "train", data_root=meta)
    from gdl_tpu.data.datasets import KSDataset

    data, class_file = build_ks_fixture(root, args.clips)
    cfg = Config(dataset="KineticSound", use_video_frames=3,
                 batch_size=args.batch, compute_dtype="bfloat16")
    return cfg, KSDataset(cfg, "train", data_path=data,
                          class_file=class_file)


def bench_loader(cfg, dataset, workers, batch, epochs=3):
    from gdl_tpu.data.loader import Loader

    loader = Loader(dataset, batch_size=batch, shuffle=True, drop_last=True,
                    num_workers=workers, seed=0)
    # one warm epoch (page cache, lazy imports, native .so build)
    n = sum(len(b["label"]) for b in loader)
    t0 = time.perf_counter()
    total = 0
    for _ in range(epochs):
        for b in loader:
            total += len(b["label"])
    dt = time.perf_counter() - t0
    return total / dt, n


def bench_with_step(cfg, dataset, workers, batch, epochs):
    """End-to-end: real Loader feeding the real jitted DGL train step
    (raw batches; on-device preprocessing) — host and device overlapped by
    the loader's prefetch thread."""
    import jax
    import jax.numpy as jnp

    from gdl_tpu.data.loader import Loader
    from gdl_tpu.data.preprocess import make_train_preprocess
    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.dgl import create_train_state, make_dgl_train_step
    from gdl_tpu.train.optim import make_optimizer

    model = AVClassifierDGL(config=cfg, dtype=jnp.bfloat16)
    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, optimizer)
    preprocess = make_train_preprocess(cfg)
    step = jax.jit(make_dgl_train_step(model, cfg, optimizer,
                                       preprocess=preprocess, base_rng=rng),
                   donate_argnums=(0,))
    loader = Loader(dataset, batch_size=batch, shuffle=True, drop_last=True,
                    num_workers=workers, seed=0)
    # warm: one epoch through the step (compile + cache)
    m = None
    for b in loader:
        state, m = step(state, {k: jnp.asarray(v) for k, v in b.items()})
    jax.block_until_ready(m["loss"])
    total = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for b in loader:
            total += len(b["label"])
            state, m = step(state,
                            {k: jnp.asarray(v) for k, v in b.items()})
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return total / dt


def bench_warmup_write(cfg, dataset, workers, batch, epochs, pre_root):
    """First-epoch live-decode + cache-populate (--preprocessed_write)
    vs the steady-state cached epochs that follow in the SAME process
    (VERDICT r3 item 8: the first-epoch-on-a-fresh-dataset story). The
    write path invalidates collate_cached's memoized misses per clip, so
    steady state runs the native whole-batch collate without a restart."""
    from gdl_tpu.data.loader import Loader

    # warm lazy imports + the native .so OUTSIDE the measured first epoch
    # (live path: preprocessed root not set yet)
    dataset[0]
    dataset.cfg.preprocessed_path = pre_root
    dataset.cfg.preprocessed_write = True
    loader = Loader(dataset, batch_size=batch, shuffle=True, drop_last=True,
                    num_workers=workers, seed=0)
    it = iter(loader)
    t0 = time.perf_counter()
    warm_n = sum(len(b["label"]) for b in it)
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    total = 0
    for _ in range(epochs):
        for b in loader:
            total += len(b["label"])
    t_steady = time.perf_counter() - t0
    return warm_n / t_warm, total / t_steady


def bench_offline_sweep(cfg, dataset, workers_list, batch, root):
    """Offline-prep throughput sweep + time-to-first-trainable-epoch
    synthesis (VERDICT r4 item 6). For each worker count, builds the
    cache from scratch and times it; then measures the pure-live loader
    rate, the cached loader rate, and the --preprocessed_write warm-up
    rate, and prints the three time-to-first-epoch recipes."""
    import shutil

    from tools.preprocess_dataset import preprocess

    n_clips = len(dataset)
    print("| prep workers | cache build s | offline clips/s |")
    print("|---|---|---|")
    best_prep = None
    for w in workers_list:
        pre_root = os.path.join(root, f"sweep_cache_w{w}")
        shutil.rmtree(pre_root, ignore_errors=True)
        t0 = time.perf_counter()
        n = preprocess(cfg, pre_root, datasets=[dataset], workers=w)
        dt = time.perf_counter() - t0
        print(f"| {w} | {dt:.1f} | {n / dt:.1f} |")
        if best_prep is None or dt < best_prep[1]:
            best_prep = (w, dt, pre_root)

    # pure live epochs (no cache configured)
    dataset.cfg.preprocessed_path = None
    dataset.cfg.preprocessed_write = False
    live_cps, _ = bench_loader(cfg, dataset, max(workers_list), batch,
                               epochs=2)
    # cached epochs over the best prep run's cache
    dataset.cfg.preprocessed_path = best_prep[2]
    cached_cps, _ = bench_loader(cfg, dataset, max(workers_list), batch,
                                 epochs=2)
    dataset.cfg.preprocessed_path = None
    # warmup-write first epoch (fresh cache dir, same dataset)
    warm_root = os.path.join(root, "sweep_warm_cache")
    shutil.rmtree(warm_root, ignore_errors=True)
    warm_cps, steady_cps = bench_warmup_write(
        cfg, dataset, max(workers_list), batch, 1, warm_root)

    print(f"# loader rates (clips/s): live {live_cps:.1f}, "
          f"cached {cached_cps:.1f}, warmup-write first epoch "
          f"{warm_cps:.1f} (steady {steady_cps:.1f})")
    print("| recipe | time to FIRST trainable epoch "
          f"({n_clips} clips) | epochs 2+ |")
    print("|---|---|---|")
    print(f"| pure live | {n_clips / live_cps:.1f} s "
          f"| {n_clips / live_cps:.1f} s |")
    print(f"| offline prep (w={best_prep[0]}) + cached epoch "
          f"| {best_prep[1] + n_clips / cached_cps:.1f} s "
          f"(prep {best_prep[1]:.1f} + epoch "
          f"{n_clips / cached_cps:.1f}) | {n_clips / cached_cps:.1f} s |")
    print(f"| --preprocessed_write warm-up | {n_clips / warm_cps:.1f} s "
          f"| {n_clips / steady_cps:.1f} s |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="CREMAD", choices=["CREMAD", "KS"])
    ap.add_argument("--clips", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--fps", type=int, default=1)
    ap.add_argument("--workers", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--native-jpeg", action="store_true")
    ap.add_argument("--with-step", action="store_true")
    ap.add_argument("--preprocessed", action="store_true",
                    help="build the offline cache (tools/"
                         "preprocess_dataset.py) over the fixture tree "
                         "first and bench the cached read path")
    ap.add_argument("--warmup-write", action="store_true",
                    help="measure the --preprocessed_write first epoch "
                         "(live decode + cache populate) vs the cached "
                         "steady-state epochs that follow, same process")
    ap.add_argument("--offline-sweep", action="store_true",
                    help="offline-prep worker sweep + time-to-first-"
                         "trainable-epoch table (offline vs "
                         "--preprocessed_write vs pure live)")
    args = ap.parse_args()

    if args.native_jpeg:
        os.environ["GDL_NATIVE_JPEG"] = "1"

    ncores = os.cpu_count() or 1
    with tempfile.TemporaryDirectory() as root:
        cfg, dataset = _make_dataset(args, root)
        if args.preprocessed:
            from tools.preprocess_dataset import preprocess

            pre_root = os.path.join(root, "preprocessed")
            t0 = time.perf_counter()
            n = preprocess(cfg, pre_root, datasets=[dataset],
                           workers=max(args.workers))
            print(f"# cache build: {n} clips in "
                  f"{time.perf_counter() - t0:.1f}s -> {pre_root}")
            dataset.cfg.preprocessed_path = pre_root
        print(f"# {args.dataset}: {len(dataset)} clips on disk, "
              f"{ncores} host core(s), native_jpeg="
              f"{bool(os.environ.get('GDL_NATIVE_JPEG'))}")
        if args.offline_sweep:
            bench_offline_sweep(cfg, dataset, args.workers, args.batch,
                                root)
            return
        print("| workers | host clips/s | clips/s/core |")
        print("|---|---|---|")
        best = 0.0
        for w in args.workers:
            cps, _ = bench_loader(cfg, dataset, w, args.batch, args.epochs)
            best = max(best, cps)
            print(f"| {w} | {cps:.1f} | {cps / ncores:.1f} |")
        chip_rate = 2630.0  # bench.py bs64 flagship clips/s (BENCH_r03)
        print(f"# cores to feed one chip at {chip_rate:.0f} clips/s: "
              f"{chip_rate / (best / ncores):.1f}")
        if args.warmup_write:
            pre_root = os.path.join(root, "warm_cache")
            warm_cps, steady_cps = bench_warmup_write(
                cfg, dataset, max(args.workers), args.batch, args.epochs,
                pre_root)
            print(f"# warmup-write first epoch (live decode + cache "
                  f"populate): {warm_cps:.1f} clips/s "
                  f"({warm_cps / ncores:.1f}/core)")
            print(f"# steady-state cached epochs (same process): "
                  f"{steady_cps:.1f} clips/s "
                  f"({steady_cps / ncores:.1f}/core)")
        if args.with_step:
            e2e = bench_with_step(cfg, dataset, max(args.workers),
                                  args.batch, args.epochs)
            print(f"# end-to-end loader->device train step: "
                  f"{e2e:.1f} clips/s (batch {args.batch})")


if __name__ == "__main__":
    main()
