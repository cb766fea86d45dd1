"""orbax checkpoint round-trip + event writer tests."""

import json
import os.path as osp

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.engine.train import TrainState
from catre_tpu.models import CATREConfig, CATREDisRShared, init_params
from catre_tpu.solver import build_optimizer
from catre_tpu.utils import checkpoint as ckpt
from catre_tpu.utils.events import EventStorage, JSONWriter, MetricPrinter


def test_orbax_roundtrip(tmp_path):
    cfg = CATREConfig(num_pcl=32, num_kps=32)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 1e-3}})
    state = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))

    d = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(d, 7, state)
    assert ckpt.latest_step(d) == 7

    # restore into a fresh abstract state
    params2 = init_params(model, cfg, jax.random.PRNGKey(1))
    state2 = TrainState(params2, tx.init(params2), jnp.zeros([], jnp.int32))
    restored = ckpt.load_checkpoint(d, state2)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer slow buffer restored too
    sa = jax.tree_util.tree_leaves(state.opt_state)[0]
    sb = jax.tree_util.tree_leaves(restored.opt_state)[0]
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb))


def test_checkpoint_max_to_keep(tmp_path):
    d = str(tmp_path / "ckpt")
    state = {"x": jnp.ones(3)}
    for step in range(4):
        ckpt.save_checkpoint(d, step, state, keep=2)
    assert ckpt.latest_step(d) == 3


def test_event_storage_and_writers(tmp_path):
    storage = EventStorage()
    for it in range(5):
        storage.iter = it
        storage.put_scalars(loss_total=1.0 / (it + 1), lr=1e-4)
    assert storage.latest()["loss_total"][1] == 4
    assert 0 < storage.median("loss_total") <= 1.0

    path = str(tmp_path / "metrics.json")
    w = JSONWriter(path)
    w.write(storage)
    w.close()
    rec = json.loads(open(path).read().strip())
    assert rec["iteration"] == 4 and "loss_total" in rec

    MetricPrinter(max_iter=10).write(storage)  # must not raise


def test_tb_histograms(tmp_path):
    """EventStorage.put_histogram flushes to tensorboard (the reference
    writer's histogram path, `my_writer.py:102-105`)."""
    import numpy as np

    from catre_tpu.utils.events import EventStorage, TensorboardWriter

    storage = EventStorage(0)
    storage.put_histogram("grads/rot_head", np.random.default_rng(0).normal(size=256))
    w = TensorboardWriter(str(tmp_path / "tb"))
    w.write(storage)
    w.close()
    assert not storage._histograms  # drained

    from tensorboard.backend.event_processing import event_accumulator

    ea = event_accumulator.EventAccumulator(str(tmp_path / "tb"))
    ea.Reload()
    assert "grads/rot_head" in ea.Tags().get("histograms", [])
