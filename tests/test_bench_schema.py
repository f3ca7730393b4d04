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
