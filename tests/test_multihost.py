"""Multi-host SPMD end-to-end test (VERDICT r1 next-round #1): two real
processes x 4 virtual CPU devices each, joined by jax.distributed into one
8-device mesh, must reproduce the single-process 8-device losses; eval
predictions gather across processes; the rank-strided loader partition is
disjoint and complete.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

import _multihost_worker as W

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_proc_outputs(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("multihost"))
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, osp.join(REPO, "tests", "_multihost_worker.py"),
             str(rank), "2", str(port), outdir],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        logs.append(out)
    for rank, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{log[-4000:]}"
    outs = {}
    for rank in (0, 1):
        with open(osp.join(outdir, f"out_rank{rank}.json")) as f:
            outs[rank] = json.load(f)
    return outs


def test_two_process_loss_parity(two_proc_outputs):
    """2-proc x 4-dev global mesh == single-process 8-dev mesh, same data."""
    from catre_tpu.parallel import make_mesh

    gbatch = W.global_train_batch()
    ref_losses = W.run_train_steps(make_mesh(8), lambda: gbatch)

    for rank in (0, 1):
        got = np.asarray(two_proc_outputs[rank]["losses"])
        np.testing.assert_allclose(got, np.asarray(ref_losses), rtol=1e-4, atol=1e-5)


def test_two_process_eval_gather(two_proc_outputs):
    """Each process scores half the images; rank 0's gathered metrics equal
    the single-process evaluation; rank 1 returns empty."""
    images = W.eval_fixture()
    ev = W.make_evaluator(images)
    W.process_images(ev, images, sorted(images))
    ref = {k: float(v) for k, v in ev.evaluate(dump=False)[1]["summary"].items()}

    assert two_proc_outputs[1]["eval_empty"] is True
    assert two_proc_outputs[1]["summary"] is None
    got = two_proc_outputs[0]["summary"]
    assert got is not None
    for k, v in ref.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_two_process_loader_partition(two_proc_outputs):
    """Rank-strided training partition: one global shuffle split disjointly
    and completely across ranks."""
    ids0 = two_proc_outputs[0]["loader_ids"]
    ids1 = two_proc_outputs[1]["loader_ids"]
    assert len(ids0) == 7 and len(ids1) == 6  # 13 records, stride 2
    assert set(ids0).isdisjoint(ids1)
    assert set(ids0) | set(ids1) == set(range(13))
