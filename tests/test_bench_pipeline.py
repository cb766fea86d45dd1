"""Smoke test for the pipeline-level bench (bench.py) — the driver runs
bench.py every round, so a broken synthesis/loader/timing path there is
expensive. Runs tiny on CPU (fused kernels off, 4 frames, 128 points)."""

import json
import sys
import os.path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def test_write_synthetic_frames(tmp_path):
    import bench

    recs = bench._write_synthetic_frames(str(tmp_path), n_frames=2)
    assert len(recs) == 2
    r = recs[0]
    assert osp.isfile(r["depth_file"])
    assert len(r["annotations"]) == 8
    a = r["annotations"][0]
    assert a["pose"].shape == (3, 4) and a["pose_est"].shape == (3, 4)
    # depth png decodes back through the loader's reader
    from catre_tpu.data.loader import load_depth

    d = load_depth(r["depth_file"])
    assert d.shape == (480, 640) and (d > 0).any()
    # gt translation consistent with the plate depth
    assert 0.7 < a["pose"][2, 3] < 1.3


def test_bench_pipeline_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("BENCH_PIPE_FRAMES", "4")
    monkeypatch.setenv("BENCH_PIPE_PCL", "128")
    import bench

    rec = bench.bench_pipeline(ims_per_batch=2)
    assert rec["unit"] == "obj/s/chip"
    assert np.isfinite(rec["value"]) and rec["value"] > 0
    json.dumps(rec)  # driver-parseable
