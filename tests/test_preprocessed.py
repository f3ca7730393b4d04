"""Offline-preprocessed dataset cache (tools/preprocess_dataset.py +
`--preprocessed_path`): a cached epoch must be sample-for-sample BITWISE
identical to the live-decode epoch — same per-(seed, epoch, idx)
augmentation draws (audio crop start, frame selection), same corrupt-
media fallback — while skipping wav/JPEG decode and resampling (the
measured host bottleneck, benchmarks/RESULTS.md 'host input-pipeline
at rate')."""

import os

import numpy as np
import pytest

from gdl_tpu.config import Config
from gdl_tpu.data import native
from gdl_tpu.data.datasets import CremadDataset, KSDataset
from tests.test_datasets import make_cremad_tree, write_jpgs, write_wav
from tools.preprocess_dataset import preprocess


@pytest.fixture()
def no_native(monkeypatch):
    """Force the pure-Python live path: the cache stores load_wav output
    and replays the python tail, so bitwise comparison needs the live
    side on the same numerics (the native path is tolerance-equal, not
    bitwise — tests/test_native.py)."""
    monkeypatch.setattr(native, "available", lambda: False)


def _cremad(tmp_path, preprocessed=""):
    names = [(f"clip{i}", lbl) for i, lbl in enumerate(
        ["NEU", "HAP", "SAD", "FEA"])]
    audio, visual, data_root = make_cremad_tree(tmp_path, names)
    cfg = Config(dataset="CREMAD", fps=1, audio_path=audio,
                 visual_path=visual, preprocessed_path=preprocessed)
    return cfg, data_root


def test_cremad_cached_epoch_bitwise_equal(tmp_path, no_native):
    cfg, data_root = _cremad(tmp_path)
    live_tr = CremadDataset(cfg, "train", data_root=data_root)
    live_ev = CremadDataset(cfg, "test", data_root=data_root)
    out = str(tmp_path / "pre")
    n = preprocess(cfg, out, datasets=[live_tr], workers=2)
    assert n == len(live_tr)

    cfg2, _ = _cremad(tmp_path, preprocessed=out)
    cached_tr = CremadDataset(cfg2, "train", data_root=data_root)
    cached_ev = CremadDataset(cfg2, "test", data_root=data_root)

    for epoch in (0, 1):
        live_tr.set_epoch(epoch)
        cached_tr.set_epoch(epoch)
        for i in range(len(live_tr)):
            wl, fl, ll, sl = live_tr[i]
            wc, fc, lc, sc = cached_tr[i]
            np.testing.assert_array_equal(wl, wc)
            np.testing.assert_array_equal(fl, fc)
            assert ll == lc
    wl, fl, _, _ = live_ev[0]
    wc, fc, _, _ = cached_ev[0]
    np.testing.assert_array_equal(wl, wc)
    np.testing.assert_array_equal(fl, fc)


def test_missing_cache_entry_falls_back_to_live(tmp_path, no_native):
    cfg, data_root = _cremad(tmp_path)
    live = CremadDataset(cfg, "train", data_root=data_root)
    out = str(tmp_path / "pre")
    preprocess(cfg, out, datasets=[live], workers=2)
    # delete one clip's audio cache: that sample must still decode live
    from gdl_tpu.data.datasets import preprocessed_audio_file

    os.remove(preprocessed_audio_file(out, live.audio[1]))
    cfg2, _ = _cremad(tmp_path, preprocessed=out)
    cached = CremadDataset(cfg2, "train", data_root=data_root)
    wl, fl, _, _ = live[1]
    wc, fc, _, _ = cached[1]
    np.testing.assert_array_equal(wl, wc)
    np.testing.assert_array_equal(fl, fc)


def _ks_tree(tmp_path):
    """Minimal KS tree (mirrors test_datasets.test_ks_tree_semantics):
    exercises the RANDOM per-epoch audio crop (10 s tile, 5 s window)
    and >3-frame random frame selection."""
    class_file = tmp_path / "class.txt"
    class_file.write_text("dog,cat")
    data = tmp_path / "ks"
    rng = np.random.default_rng(3)
    for cname in ("dog", "cat"):
        vdir = data / "visual" / "train_img/Image-01-FPS" / cname
        adir = data / "audio" / "train" / cname
        os.makedirs(adir, exist_ok=True)
        for vid in ("vidA", "vidB"):
            write_jpgs(vdir / vid, n=6)
            write_wav(adir / f"{vid}.wav",
                      rng.standard_normal(44100 * 2) * 0.1, 44100)
    cfg = lambda pre="": Config(  # noqa: E731
        dataset="KineticSound", fps=1, use_video_frames=3,
        preprocessed_path=pre)
    # KSDataset takes its tree via data_path (cfg audio/visual paths are
    # CREMAD-family knobs it ignores) — returning it keeps the datasets
    # NON-EMPTY; the pre-round-4 version of this fixture omitted it, so
    # every KS assertion below ran over zero samples (vacuous — exposed
    # when 4-tuple collate made empty batches impossible to stack)
    return cfg, str(class_file), str(data)


def test_ks_cached_random_crop_and_frames_equal(tmp_path, no_native):
    cfg_of, class_file, data = _ks_tree(tmp_path)
    live = KSDataset(cfg_of(), "train", data_path=data,
                     class_file=class_file)
    assert len(live) == 4  # 2 classes x 2 vids — NOT vacuous
    out = str(tmp_path / "pre")
    preprocess(cfg_of(), out, datasets=[live], workers=2)
    cached = KSDataset(cfg_of(out), "train", data_path=data,
                       class_file=class_file)
    for epoch in (0, 2):
        live.set_epoch(epoch)
        cached.set_epoch(epoch)
        for i in range(len(live)):
            wl, fl, ll, sl = live[i]
            wc, fc, lc, sc = cached[i]
            np.testing.assert_array_equal(wl, wc)
            np.testing.assert_array_equal(fl, fc)
            np.testing.assert_array_equal(sl, sc)
            assert ll == lc


needs_native_collate = pytest.mark.skipif(
    not native.collate_available(),
    reason="native gdl_collate_cached unavailable (no compiler?)")


@needs_native_collate
def test_native_collate_bitwise_equal_cremad(tmp_path, no_native):
    """The Loader's whole-batch native collate (gdl_collate_cached) must
    be bitwise-equal to the per-sample python cached path — same RNG
    draw order per (seed, epoch, idx), same tile/crop/clip numerics.
    no_native forces __getitem__ onto the pure-python path while
    collate_cached (gated on collate_available) still runs native."""
    cfg, data_root = _cremad(tmp_path)
    ds = CremadDataset(cfg, "train", data_root=data_root)
    out = str(tmp_path / "pre")
    preprocess(cfg, out, datasets=[ds], workers=2)
    cfg2, _ = _cremad(tmp_path, preprocessed=out)
    cached = CremadDataset(cfg2, "train", data_root=data_root)
    idx = list(range(len(cached)))
    for epoch in (0, 1):
        cached.set_epoch(epoch)
        got = cached.collate_cached(idx, nthreads=2)
        assert got is not None
        wave, frames, labels, sizes = got
        for row, i in enumerate(idx):
            w, f, lbl, sz = cached[i]  # per-sample python cached path
            assert wave.dtype == w.dtype and frames.dtype == f.dtype
            np.testing.assert_array_equal(wave[row], w)
            np.testing.assert_array_equal(frames[row], f)
            np.testing.assert_array_equal(sizes[row], sz)
            assert labels[row] == lbl


@needs_native_collate
@pytest.mark.parametrize("mode_epoch", [("train", 0), ("train", 2)])
def test_native_collate_bitwise_equal_ks(tmp_path, no_native, mode_epoch):
    """KS shapes: the random 5 s crop start (one randint BEFORE the frame
    draws) and the tile-to-10 s doubling must replicate exactly."""
    mode, epoch = mode_epoch
    cfg_of, class_file, data = _ks_tree(tmp_path)
    live = KSDataset(cfg_of(), "train", data_path=data,
                     class_file=class_file)
    out = str(tmp_path / "pre")
    preprocess(cfg_of(), out, datasets=[live], workers=2)
    cached = KSDataset(cfg_of(out), "train", data_path=data,
                       class_file=class_file)
    idx = list(range(len(cached)))
    assert len(idx) == 4  # NOT vacuous
    cached.set_epoch(epoch)
    got = cached.collate_cached(idx, nthreads=2)
    assert got is not None
    wave, frames, labels, sizes = got
    for row, i in enumerate(idx):
        w, f, lbl, sz = cached[i]
        np.testing.assert_array_equal(wave[row], w)
        np.testing.assert_array_equal(frames[row], f)
        np.testing.assert_array_equal(sizes[row], sz)
        assert labels[row] == lbl


@needs_native_collate
def test_native_collate_partial_cache_returns_none(tmp_path, no_native):
    """A batch containing ANY uncached clip must decline the fast path
    (return None) so the Loader's per-sample path handles the mix."""
    cfg, data_root = _cremad(tmp_path)
    ds = CremadDataset(cfg, "train", data_root=data_root)
    out = str(tmp_path / "pre")
    preprocess(cfg, out, datasets=[ds], workers=2)
    from gdl_tpu.data.datasets import preprocessed_audio_file

    cfg2, _ = _cremad(tmp_path, preprocessed=out)
    cached = CremadDataset(cfg2, "train", data_root=data_root)
    os.remove(preprocessed_audio_file(out, cached.audio[1]))
    assert cached.collate_cached([0, 1], nthreads=1) is None
    assert cached.collate_cached([0], nthreads=1) is not None
    # the Loader-level fallback still yields the full, correct batch
    from gdl_tpu.data.loader import Loader

    loader = Loader(cached, batch_size=2, shuffle=False, drop_last=True,
                    num_workers=2, seed=0)
    batch = next(iter(loader))
    cached.set_epoch(1)  # Loader's __iter__ advanced to epoch 1
    w1, f1, l1, _ = cached[1]
    np.testing.assert_array_equal(batch["wave"][1], w1)
    np.testing.assert_array_equal(batch["frames"][1], f1)
    assert batch["label"][1] == l1


@needs_native_collate
def test_loader_uses_native_collate(tmp_path, no_native, monkeypatch):
    """Wiring check: with a full cache the Loader's batches come from
    collate_cached (spied) and equal the per-sample stack."""
    cfg, data_root = _cremad(tmp_path)
    ds = CremadDataset(cfg, "train", data_root=data_root)
    out = str(tmp_path / "pre")
    preprocess(cfg, out, datasets=[ds], workers=2)
    cfg2, _ = _cremad(tmp_path, preprocessed=out)
    cached = CremadDataset(cfg2, "train", data_root=data_root)
    calls = []
    orig = cached.collate_cached

    def spy(indices, nthreads=1):
        calls.append(list(indices))
        return orig(indices, nthreads=nthreads)

    monkeypatch.setattr(cached, "collate_cached", spy)
    from gdl_tpu.data.loader import Loader

    loader = Loader(cached, batch_size=2, shuffle=True, drop_last=True,
                    num_workers=2, seed=0)
    batches = list(loader)
    assert calls and sum(len(c) for c in calls) == 2 * len(batches)
    for indices, batch in zip(calls, batches):
        for row, i in enumerate(indices):
            w, f, lbl, _ = cached[i]
            np.testing.assert_array_equal(batch["wave"][row], w)
            np.testing.assert_array_equal(batch["frames"][row], f)
            assert batch["label"][row] == lbl


def test_preprocessed_write_warms_cache(tmp_path, no_native):
    """--preprocessed_write: an EMPTY cache root fills on the fly from
    live decodes — epoch-0 samples are bitwise-equal to pure live
    decode, the cache files appear, and later epochs serve from the
    cache (batch fast path included) with the same bytes."""
    cfg, data_root = _cremad(tmp_path)
    live = CremadDataset(cfg, "train", data_root=data_root)
    out = str(tmp_path / "pre")
    cfg2, _ = _cremad(tmp_path, preprocessed=out)
    cfg2.preprocessed_write = True
    warm = CremadDataset(cfg2, "train", data_root=data_root)

    from gdl_tpu.data.datasets import (
        preprocessed_audio_file,
        preprocessed_frames_file,
    )

    assert not os.path.exists(preprocessed_audio_file(out, warm.audio[0]))
    for epoch in (0, 1):
        live.set_epoch(epoch)
        warm.set_epoch(epoch)
        for i in range(len(live)):
            wl, fl, ll, sl = live[i]
            ww, fw, lw, sw = warm[i]
            np.testing.assert_array_equal(wl, ww)
            np.testing.assert_array_equal(fl, fw)
            np.testing.assert_array_equal(sl, sw)
            assert ll == lw
    for i in range(len(warm)):
        assert os.path.exists(preprocessed_audio_file(out, warm.audio[i]))
        assert os.path.exists(preprocessed_frames_file(out, warm.image[i]))
    if native.collate_available():
        warm.set_epoch(2)
        got = warm.collate_cached(list(range(len(warm))), nthreads=1)
        assert got is not None
        live.set_epoch(2)
        for row in range(len(warm)):
            wl, fl, ll, _ = live[row]
            np.testing.assert_array_equal(got[0][row], wl)
            np.testing.assert_array_equal(got[1][row], fl)
            assert got[2][row] == ll


def test_preprocessed_write_flag_plumbs():
    import argparse

    from gdl_tpu.config import add_arguments, from_args

    parser = argparse.ArgumentParser()
    add_arguments(parser, dgl=True)
    ns = parser.parse_args(["--ckpt_path", "x", "--preprocessed_path",
                            "/pre", "--preprocessed_write", "1"])
    assert from_args(ns).preprocessed_write


def test_cli_flag_plumbs_to_config():
    import argparse

    from gdl_tpu.config import add_arguments, from_args

    parser = argparse.ArgumentParser()
    add_arguments(parser, dgl=True)
    ns = parser.parse_args(["--ckpt_path", "x",
                            "--preprocessed_path", "/pre"])
    assert from_args(ns).preprocessed_path == "/pre"
