"""Fixture-tree tests for the remaining dataset list builders: VGGSound
csv/class-id semantics, AVE split files + dedup + size-skip, K400 class
dirs + size skips, AudioSet stub, metrics accounting."""

import csv
import os
import wave as wave_mod

import numpy as np

from gdl_tpu.config import Config
from gdl_tpu.data.datasets import (
    AVEDataset,
    AudioSetDataset,
    Kinetics400Dataset,
    VGGSoundDataset,
)
from gdl_tpu.utils.metrics import PerClassAccuracy, obtain_top1_accuracy
from tests.test_datasets import write_jpgs, write_wav


def test_vggsound_list_and_class_ids(tmp_path):
    data = tmp_path / "vgg"
    rows = []
    rng = np.random.default_rng(0)
    # two classes; ids assigned by first-seen order of TRAIN rows
    for i, (ytid, cls, split) in enumerate([
            ("vidA", "barking", "train"), ("vidB", "singing", "train"),
            ("vidC", "barking", "train"), ("vidD", "singing", "test"),
            ("vidE", "barking", "test"), ("vidF", "barking", "skipme")]):
        start = str(i)
        rows.append([ytid, start, cls, split])
        name = f"{ytid}_{start.zfill(6)}"
        if split == "train":
            vdir = data / "video/train-set-img/Image-01-FPS" / f"{name}.mp4"
            adir = data / "audio/train-audios/train-set"
        elif split == "test":
            vdir = data / "video/test-set-img/Image-01-FPS" / f"{name}.mp4"
            adir = data / "audio/test-audios/test-set"
        else:
            continue
        write_jpgs(vdir, n=4)
        os.makedirs(adir, exist_ok=True)
        write_wav(adir / f"{name}.wav", rng.standard_normal(16000) * 0.1,
                  16000)
    csv_path = tmp_path / "vggsound.csv"
    with open(csv_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)

    cfg = Config(dataset="VGGSound", fps=1, use_video_frames=3)
    train = VGGSoundDataset(cfg, "train", csv_path=str(csv_path),
                            data_path=str(data) + "/")
    test = VGGSoundDataset(cfg, "test", csv_path=str(csv_path),
                           data_path=str(data) + "/")
    assert len(train) == 3 and len(test) == 2
    # barking first-seen → 0, singing → 1 (VGGSoundDataset.py:91-102)
    assert train.label == [0, 1, 0]
    assert test.label == [1, 0]
    wave, frames, label, sizes = test[0]
    assert wave.shape == (16000 * 5,)
    assert frames.shape[0] == 3


def test_ave_list_building(tmp_path):
    root = tmp_path / "AVE_Dataset"
    os.makedirs(root / "Audios", exist_ok=True)
    rng = np.random.default_rng(1)
    # classes derived from the TEST split file (AVEDataset.py:43-51)
    (root / "testSet.txt").write_text(
        "dog&clip1&x\ncat&clip2&x\ndog&clip3&x\n")
    (root / "trainSet.txt").write_text(
        "dog&clip4&x\ncat&clip5&x\ndog&clip4&x\ncat&clip6&x\n")
    for name, tiny in [("clip4", False), ("clip5", False), ("clip6", True)]:
        if tiny:  # <200 bytes skipped (AVEDataset.py:64)
            (root / "Audios" / f"{name}.wav").write_bytes(b"RIFF")
        else:
            write_wav(root / "Audios" / f"{name}.wav",
                      rng.standard_normal(22050) * 0.1, 22050)
        write_jpgs(root / "Image-01-FPS-SE" / name, n=2)

    cfg = Config(dataset="AVE", fps=1, num_frame=1)
    ds = AVEDataset(cfg, "train", data_root=str(root) + "/")
    # clip4 deduped, clip6 too small → clip4(dog=0), clip5(cat=1)
    assert len(ds) == 2
    assert ds.label == [0, 1]
    wave, frames, label, sizes = ds[0]
    assert wave.shape == (22050 * 3,)
    assert frames.shape[0] == 1


def test_k400_list_building(tmp_path):
    data = tmp_path / "k400"
    rng = np.random.default_rng(2)
    big = (rng.standard_normal(80 * 1024) * 0.1)  # > 80 KiB as pcm16
    for cname in ("abseiling", "zumba"):
        adir = data / "audio/train" / cname
        vroot = data / "visual/train_img/Image-01-FPS" / cname
        os.makedirs(adir, exist_ok=True)
        write_wav(adir / "vid1.wav", big, 16000)
        write_wav(adir / "vid2.wav", rng.standard_normal(100) * 0.1, 16000)
        write_jpgs(vroot / "vid1", n=4)
        write_jpgs(vroot / "vid2", n=4)
    cfg = Config(dataset="kinect400", use_video_frames=3)
    ds = Kinetics400Dataset(cfg, "train", data_path=str(data))
    # vid2 skipped per class (<80 KiB audio, Kinect400.py:77-79)
    assert len(ds) == 2
    assert sorted(set(ds.label)) == [0, 1]


def test_audioset_stub(tmp_path):
    root = tmp_path / "aset" / "train"
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(3)
    write_wav(root / "a.wav", rng.standard_normal(16000) * 0.1, 16000)
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text("a,7\n")
    cfg = Config(dataset="CREMAD")
    ds = AudioSetDataset(cfg, "train", data_path=str(tmp_path / "aset"),
                         label_csv=str(label_csv))
    wave, wave2, label = ds[0]
    # audio-only stub returns (spec-source, spec-source, label)
    np.testing.assert_array_equal(wave, wave2)
    assert wave.shape == (16000 * 5,)
    assert label == 7


def test_per_class_accuracy_matches_reference_loop():
    counters = PerClassAccuracy(3)
    pred = np.array([0, 1, 2, 2])
    pred_a = np.array([0, 0, 0, 2])
    pred_v = np.array([1, 1, 2, 2])
    label = np.array([0, 1, 1, 2])
    counters.update(pred, pred_a, pred_v, label)
    acc, acc_a, acc_v = counters.results()
    assert np.isclose(acc, 3 / 4)     # correct: 0,1,2 (idx 0,1,3)
    assert np.isclose(acc_a, 2 / 4)   # idx 0, 3
    assert np.isclose(acc_v, 2 / 4)   # idx 1, 3
    per = counters.per_class()
    assert np.isclose(per[1], 0.5)    # one of two class-1 samples right


def test_obtain_top1_accuracy():
    logits = np.array([[0.1, 0.9], [0.8, 0.2]])
    labels = np.array([1, 1])
    assert obtain_top1_accuracy(logits, labels) == 0.5
