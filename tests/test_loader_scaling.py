"""Multi-host input-path SCALING evidence (VERDICT r3 #8).

tests/test_multihost.py proves the rank-strided loader partition is disjoint
and complete (parity); this test shows the partition actually PARALLELIZES
the feeding work — the pod feed-rate claim in docs/PERF.md. Reference
analogue: each DDP rank runs its own dataloader workers over its
`my_distributed_sampler.py:12-55` stride.

The CI box has ONE CPU (nproc=1), so a concurrent 2-process wall-clock
speedup is physically unmeasurable here. The scaling claim decomposes into
two testable invariants, measured with the worker processes run
SEQUENTIALLY (no core-contention confound):

  1. work sharding: each of W ranks host-processes exactly its 1/W share of
     the epoch's records/objects (disjoint + complete);
  2. no sharding overhead: a rank's per-record host cost under world=2
     matches the world=1 cost (ratio bounded) — rank striding adds no
     per-record work.

Together: on W independent feeder hosts the aggregate obj/s is W x the
single-host rate (each host does 1/W of the records at the same per-record
cost). The thresholds on (2) are loose (1.35x) because single-record decode
times on a 1-core box jitter with background load."""

import json
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from catre_tpu.data import meta  # noqa: E402

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
N_FRAMES = 48


@pytest.fixture(scope="module")
def rate_data_root(tmp_path_factory):
    """N_FRAMES synthetic REAL-shaped train frames (full 640x480 decode cost,
    4 instances each) — bigger than the 2-frame pipeline fixture so the
    timed window dominates process startup jitter."""
    root = tmp_path_factory.mktemp("REAL")
    split_dir = root / "real_train" / "scene_1"
    split_dir.mkdir(parents=True)
    h, w = meta.IM_HEIGHT, meta.IM_WIDTH
    K = meta.REAL_INTRINSICS
    rng = np.random.default_rng(0)

    lines = []
    for i in range(N_FRAMES):
        im_id = f"{i:04d}"
        depth = np.zeros((h, w), dtype=np.uint16)
        mask = np.zeros((h, w), dtype=np.uint8)
        insts, classes, ts = [], [], []
        for j in range(4):
            cy, cx = 120 + 90 * j + int(rng.integers(8)), 120 + 110 * j
            depth[cy - 30:cy + 30, cx - 30:cx + 30] = 1000 + 10 * j
            mask[cy - 25:cy + 25, cx - 25:cx + 25] = j + 1
            insts.append(j + 1)
            classes.append(j % 6 + 1)
            ts.append(np.array([(cx - K[0, 2]) / K[0, 0],
                                (cy - K[1, 2]) / K[1, 1], 1.0], np.float32))
        label = {
            "instance_ids": insts,
            "class_ids": classes,
            "model_list": ["bottle_red_stanford_norm"] * 4,
            "rotations": [np.eye(3, dtype=np.float32)] * 4,
            "translations": ts,
            "scales": [1.0] * 4,
            "bboxes": [[0, 0, 50, 50]] * 4,
        }
        base = split_dir / im_id
        cv2.imwrite(str(base) + "_depth.png", depth)
        cv2.imwrite(str(base) + "_mask.png", mask)
        cv2.imwrite(str(base) + "_color.png", np.zeros((h, w, 3), np.uint8))
        with open(str(base) + "_label.pkl", "wb") as f:
            pickle.dump(label, f)
        lines.append(f"real_train/scene_1/{im_id}")
    with open(root / "real_train_list_all.txt", "w") as f:
        f.write("\n".join(lines))
    return str(root)


def _run_worker(data_root, outdir, rank, world):
    """One feeder process, run to completion (sequential by design — see
    module docstring)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = osp.join(outdir, f"rate_{world}_{rank}.json")
    p = subprocess.run(
        [sys.executable, osp.join(REPO, "tests", "_loader_rate_worker.py"),
         str(rank), str(world), data_root, out],
        env=env, cwd=REPO, timeout=300,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    assert p.returncode == 0, f"rank {rank}/{world} failed:\n{p.stdout[-3000:]}"
    return json.load(open(out))


def test_rank_sharded_feeding_scales(rate_data_root, tmp_path):
    res1 = _run_worker(rate_data_root, str(tmp_path), 0, 1)
    res2 = [_run_worker(rate_data_root, str(tmp_path), r, 2) for r in (0, 1)]

    # invariant 1: each rank does exactly its 1/W share of the epoch's work
    assert res1["records"] == N_FRAMES
    assert [r["records"] for r in res2] == [N_FRAMES // 2, N_FRAMES // 2]
    assert sum(r["objs"] for r in res2) == res1["objs"]

    # invariant 2: per-record host cost is rank/world-independent
    # median per-record cost (not wall total): robust to background-load
    # spikes stealing the single CI CPU mid-epoch
    per1 = res1["median_record_s"]
    rates = []
    for r in res2:
        per2 = r["median_record_s"]
        ratio = per2 / per1
        rates.append(r["objs"] / r["seconds"])
        assert ratio < 1.35, (
            f"rank {r['rank']} median per-record cost {per2 * 1e3:.2f} ms vs "
            f"world-1 {per1 * 1e3:.2f} ms (ratio {ratio:.2f}) — rank "
            "striding must not add per-record work")
    # implied aggregate on independent feeder hosts (documentation output)
    agg = sum(rates)
    print(f"world-1 rate {res1['objs'] / res1['seconds']:.0f} obj/s; "
          f"implied 2-host aggregate {agg:.0f} obj/s "
          f"(per-record {per1 * 1e3:.2f} ms)")
