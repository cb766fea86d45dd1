"""Sharded training/inference on the virtual 8-device CPU mesh: the full
train step under GSPMD data parallelism must produce the same math as
single-device (gradients all-reduce via the partitioner)."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.engine.refiner import make_refine_fn
from catre_tpu.engine.train import InputNoiseConfig, TrainState, make_train_step
from catre_tpu.geom import axis_symmetry_rotation_bank
from catre_tpu.losses import LossConfig
from catre_tpu.models import CATREConfig, CATREDisRShared, init_params
from catre_tpu.parallel import comm, make_mesh, pad_to_multiple, replicate_tree, shard_batch
from catre_tpu.solver import build_optimizer

from test_engine import SMALL_CFG, _synthetic_batch


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single_device():
    cfg = SMALL_CFG
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(1))
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 1e-3}})
    noise_cfg = InputNoiseConfig(bbox3d_aug_prob=0.0, rt_aug_prob=0.0)
    sym_bank = axis_symmetry_rotation_bank(max_sym_disc_step=0.1)
    step = make_train_step(model, cfg, LossConfig(), noise_cfg, tx, sym_bank, n_iter=1)

    batch = _synthetic_batch(b=8)
    key = jax.random.PRNGKey(0)

    # single-device
    state1 = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))
    state1, m1 = step(state1, dict(batch), key, 1e-3)

    # 8-way sharded
    mesh = make_mesh(8)
    params2 = init_params(model, cfg, jax.random.PRNGKey(1))
    state2 = TrainState(
        replicate_tree(mesh, params2),
        replicate_tree(mesh, tx.init(params2)),
        replicate_tree(mesh, jnp.zeros([], jnp.int32)),
    )
    sharded = shard_batch(mesh, dict(batch))
    with mesh:
        state2, m2 = step(state2, sharded, key, 1e-3)

    np.testing.assert_allclose(
        float(jnp.mean(m1["loss_total"])), float(jnp.mean(m2["loss_total"])), rtol=1e-5
    )
    # updated params identical across the replication
    l1 = jax.tree_util.tree_leaves(state1.params)[0]
    l2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_sharded_refine_inference():
    cfg = SMALL_CFG
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    refine = make_refine_fn(model, cfg, n_iter=2)
    batch = _synthetic_batch(b=16)

    mesh = make_mesh(8)
    sb = shard_batch(mesh, {k: batch[k] for k in
                            ["pcl", "obj_kps", "obj_pose", "obj_scale", "K", "obj_mean_scales"]})
    p = replicate_tree(mesh, params)
    with mesh:
        poses, scales = refine(p, sb["pcl"], sb["obj_kps"], sb["obj_pose"],
                               sb["obj_scale"], sb["K"], sb["obj_mean_scales"])
    # matches unsharded
    poses_ref, scales_ref = refine(params, batch["pcl"], batch["obj_kps"],
                                   batch["obj_pose"], batch["obj_scale"],
                                   batch["K"], batch["obj_mean_scales"])
    np.testing.assert_allclose(np.asarray(poses), np.asarray(poses_ref), atol=1e-5)


def test_pad_to_multiple():
    batch = {"pcl": np.zeros((13, 4, 3)), "valid": np.ones(13, dtype=bool)}
    out = pad_to_multiple(batch, 8)
    assert out["pcl"].shape[0] == 16
    assert out["valid"].sum() == 13


def test_comm_single_process():
    comm.init_dist()
    assert comm.get_rank() == 0
    assert comm.get_world_size() == 1
    assert comm.is_main_process()
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    assert comm.reduce_dict({"x": 2.0}) == {"x": 2.0}
    comm.synchronize()


def test_inference_slice_covers_exactly_once():
    """The contiguous split must partition [0, n) exactly (every record on
    exactly one rank), including n < world and n % world != 0."""
    from catre_tpu.parallel import comm

    for n in (0, 1, 3, 7, 8, 9, 100):
        for world in (1, 2, 3, 8):
            ids = []
            for rank in range(world):
                sl = comm.inference_slice(n, rank, world)
                ids.extend(range(n)[sl])
            assert ids == list(range(n)), (n, world, ids)
