"""bench.py's driver contract: ONE JSON line with the metric/value/unit/
vs_baseline fields (the round harness parses it every round). Tested
WITHOUT touching the TPU by exercising the pure record builder."""

import json


def test_bench_result_schema():
    import bench

    out = bench.make_result(2650.0)
    line = json.dumps(out)
    parsed = json.loads(line)
    assert parsed["metric"] == "cremad_dgl_train_clips_per_sec_per_chip"
    assert parsed["value"] == 2650.0
    assert parsed["unit"] == "clips/s"
    assert abs(parsed["vs_baseline"] - 2650.0 / 300.0) < 1e-3
    assert parsed["baseline_kind"] == "estimate"
    assert parsed["torch_cpu_floor_clips_per_sec"] > 0
    assert parsed["vs_torch_cpu_floor"] > 100
    assert "\n" not in line


def test_drift_guard_ratios_and_warnings():
    """The anchor-drift guard (VERDICT r4 item 2): vs_prev ratios for
    every shared anchor; a WARNING only past ±3%."""
    import bench

    prev = {"value": 2700.0, "bs256_clips_per_sec": 3800.0,
            "swin_clips_per_sec": 217.0, "mmformer_clips_per_sec": 950.0}
    out = {"value": 2454.5,               # -9.1% -> must warn (the r04 bug)
           "bs256_clips_per_sec": 3810.0,  # +0.3% -> no warn
           "swin_clips_per_sec": 224.0,    # +3.2% -> warn (improved)
           "ogm_clips_per_sec": 2240.0}    # absent in prev -> no ratio
    warnings = []
    bench.apply_drift_guard(out, prev, warn=warnings.append)
    r = out["vs_prev"]
    assert abs(r["value"] - 2454.5 / 2700.0) < 1e-3
    assert abs(r["bs256_clips_per_sec"] - 3810.0 / 3800.0) < 1e-3
    assert "mmformer_clips_per_sec" not in r
    assert "ogm_clips_per_sec" not in r
    assert len(warnings) == 2
    assert any("REGRESSED" in w and "'value'" in w for w in warnings)
    assert any("improved" in w and "swin" in w for w in warnings)


def test_drift_guard_no_prev_and_corrupt(tmp_path):
    """No previous record (round 1) or unreadable files: no vs_prev, no
    crash — the guard must never sink the primary metric."""
    import bench

    out = {"value": 2650.0}
    bench.apply_drift_guard(out, None, warn=lambda m: None)
    assert "vs_prev" not in out

    assert bench.find_prev_bench(str(tmp_path)) is None
    (tmp_path / "BENCH_r01.json").write_text("{not json")
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"value": 1.0}))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps({"value": 7.0}))
    rec = bench.find_prev_bench(str(tmp_path))
    assert rec == {"value": 7.0}  # highest round wins; corrupt skipped


def test_drift_guard_unwraps_driver_record(tmp_path):
    """The driver's real BENCH_r{N}.json wraps the bench line under a
    'parsed' key ({n, cmd, rc, tail, parsed}) — the guard must read the
    anchors from the INNER record (regression: the guard shipped inert
    because it compared against the wrapper's top level)."""
    import bench

    (tmp_path / "BENCH_r04.json").write_text(json.dumps({
        "n": 4, "cmd": "python bench.py", "rc": 0, "tail": "...",
        "parsed": {"value": 2700.0, "swin_clips_per_sec": 217.0}}))
    prev = bench.find_prev_bench(str(tmp_path))
    assert prev == {"value": 2700.0, "swin_clips_per_sec": 217.0}

    out = {"value": 2454.5, "swin_clips_per_sec": 216.8}
    warnings = []
    bench.apply_drift_guard(out, prev, warn=warnings.append)
    assert abs(out["vs_prev"]["value"] - 2454.5 / 2700.0) < 1e-3
    assert any("REGRESSED" in w for w in warnings)


def test_find_prev_bench_skips_anchorless_rounds(tmp_path):
    """A failed round's record (parsed: null after a tunnel outage, or a
    wrapper with no anchors) must not shadow the older valid round —
    that would silently disable the drift guard again."""
    import bench

    (tmp_path / "BENCH_r04.json").write_text(json.dumps({
        "n": 4, "rc": 0, "parsed": {"value": 2700.0}}))
    (tmp_path / "BENCH_r05.json").write_text(json.dumps({
        "n": 5, "rc": 1, "tail": "tunnel error", "parsed": None}))
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({
        "n": 6, "rc": 0, "parsed": {}}))  # empty: no anchors either
    assert bench.find_prev_bench(str(tmp_path)) == {"value": 2700.0}
