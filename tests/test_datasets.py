"""Dataset layer against synthetic on-disk fixtures: CREMA-D csv list
building + skip rules (dataset/CramedDataset.py:40-52), KS directory-tree
semantics (dataset/KSDataset.py:50-93), WAV decode/resample, and a full
real-files training epoch through main_dgl's run_training."""

import csv
import os
import wave as wave_mod

import numpy as np
import pytest
from PIL import Image

from gdl_tpu.config import Config
from gdl_tpu.data.datasets import (
    CremadDataset,
    KSDataset,
    RAW_IMAGE_SIZE,
    listdir_nohidden,
)
from gdl_tpu.data.wav import load_wav, read_wav, resample


def write_wav(path, samples, rate=16000):
    with wave_mod.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())


def write_jpgs(dirpath, n=3, size=64):
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(dirpath, f"frame_{i:05d}.jpg"))


def make_cremad_tree(root, names_labels, fps=1, missing=()):
    audio = root / "audio"
    visual = root / "visual"
    data_root = root / "meta"
    os.makedirs(audio, exist_ok=True)
    for split in ("train", "test"):
        os.makedirs(data_root / "CREMAD", exist_ok=True)
        with open(data_root / "CREMAD" / f"{split}.csv", "w",
                  newline="") as f:
            w = csv.writer(f)
            for name, label in names_labels:
                w.writerow([name, label])
    rng = np.random.default_rng(1)
    for name, _ in names_labels:
        if name in missing:
            continue
        write_wav(audio / f"{name}.wav",
                  rng.standard_normal(22050) * 0.1, rate=22050)
        write_jpgs(visual / f"Image-{fps:02d}-FPS" / name, n=3)
    return str(audio), str(visual), str(data_root) + "/"


def test_wav_reader_roundtrip(tmp_path):
    samples = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
    write_wav(tmp_path / "a.wav", samples, rate=16000)
    wave, rate = read_wav(str(tmp_path / "a.wav"))
    assert rate == 16000
    np.testing.assert_allclose(wave, samples, atol=1e-4)


def test_resample_matches_scipy():
    from scipy.signal import resample_poly

    x = np.sin(np.linspace(0, 60, 44100)).astype(np.float32)
    ours = resample(x, 44100, 22050)
    ref = resample_poly(x, 1, 2).astype(np.float32)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert load_wav.__doc__  # capability marker


def test_cremad_list_building_skips_missing(tmp_path):
    names = [("clipA", "NEU"), ("clipB", "HAP"), ("clipC", "ANG")]
    audio, visual, data_root = make_cremad_tree(tmp_path, names,
                                                missing=("clipB",))
    cfg = Config(dataset="CREMAD", fps=1, audio_path=audio,
                 visual_path=visual)
    ds = CremadDataset(cfg, "train", data_root=data_root)
    assert len(ds) == 2  # clipB skipped (CramedDataset.py:47-52)
    assert ds.label == [0, 5]  # NEU → 0, ANG → 5


def test_cremad_getitem_contract(tmp_path):
    names = [("clipA", "SAD")]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    cfg = Config(dataset="CREMAD", fps=1, audio_path=audio,
                 visual_path=visual)
    ds = CremadDataset(cfg, "test", data_root=data_root)
    wave, frames, label, sizes = ds[0]
    assert wave.shape == (22050 * 3,)  # tiled ×3 then cropped to 3 s
    assert wave.dtype == np.float32
    assert np.max(np.abs(wave)) <= 1.0
    assert frames.shape == (1, RAW_IMAGE_SIZE, RAW_IMAGE_SIZE, 3)
    assert frames.dtype == np.uint8
    # per-frame ORIGINAL sizes ride along for original-coordinate
    # RandomResizedCrop draws (write_jpgs emits 64x64 sources)
    assert sizes.shape == (1, 2) and sizes.dtype == np.int32
    np.testing.assert_array_equal(sizes, [[64, 64]])
    assert label == 2


def test_ks_tree_semantics(tmp_path):
    # class.txt with the reference's space→underscore munging
    class_file = tmp_path / "class.txt"
    class_file.write_text("playing piano, blowing nose,dog")
    data = tmp_path / "ks"
    rng = np.random.default_rng(2)
    for cname in ("playing_piano", "blowing_nose", "dog"):
        vdir = data / "visual" / "train_img/Image-01-FPS" / cname
        adir = data / "audio" / "train" / cname
        os.makedirs(adir, exist_ok=True)
        for vid in ("vid1", "vid2"):
            write_jpgs(vdir / vid, n=4 if vid == "vid1" else 2)  # vid2 <3
            write_wav(adir / f"{vid}.wav",
                      rng.standard_normal(16000) * 0.1, 16000)

    cfg = Config(dataset="KineticSound", use_video_frames=3)
    ds = KSDataset(cfg, "train", data_path=str(data),
                   class_file=str(class_file))
    # vid2 removed per class (<3 frames, KSDataset.py:80-83) → 3 samples
    assert len(ds) == 3
    assert sorted(set(ds.label)) == [0, 1, 2]
    wave, frames, label, sizes = ds[0]
    assert wave.shape == (16000 * 5,)
    assert frames.shape == (3, RAW_IMAGE_SIZE, RAW_IMAGE_SIZE, 3)


def test_listdir_nohidden(tmp_path):
    (tmp_path / "a.jpg").write_text("x")
    (tmp_path / ".hidden").write_text("x")
    entries = listdir_nohidden(str(tmp_path))
    assert len(entries) == 1 and entries[0].endswith("a.jpg")


@pytest.mark.slow
def test_real_files_training_epoch(tmp_path, monkeypatch):
    """One training epoch of the actual main_dgl flow over real (synthetic)
    wav + jpeg files — the full host-decode → device-preprocess path."""
    monkeypatch.chdir(tmp_path)
    names = [(f"clip{i}", lbl) for i, lbl in enumerate(
        ["NEU", "HAP", "SAD", "FEA", "DIS", "ANG"] * 3)]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    cfg = Config(dataset="CREMAD", fps=1, audio_path=audio,
                 visual_path=visual, batch_size=8, epochs=1,
                 encoder_width=8, encoder_stages=[1, 1, 1, 1],
                 ckpt_path=str(tmp_path / "ckpt"), train=True,
                 num_workers=2, log_grad_csv=True)

    from gdl_tpu.models.classifier import AVClassifierDGL
    from gdl_tpu.train.loop import run_training

    model = AVClassifierDGL(config=cfg)
    train_ds = CremadDataset(cfg, "train", data_root=data_root)
    test_ds = CremadDataset(cfg, "test", data_root=data_root)
    assert len(train_ds) == 18
    run_training(cfg, model, train_ds, test_ds, dgl=True)
    # per-step grad CSV written (main_dgl.py:148-152 artifact)
    rows = open("audio_visual_grad_vanilla.csv").read().strip().splitlines()
    assert len(rows) == 2  # 18 // 8 = 2 steps
    assert os.path.exists(os.path.join(cfg.ckpt_path, "CREMAD_full.csv"))