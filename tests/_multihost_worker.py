"""Worker script + shared fixtures for the 2-process multi-host tests.

Run as:  python tests/_multihost_worker.py <rank> <world> <port> <outdir>

Each process owns 4 virtual CPU devices; jax.distributed joins them into one
8-device global mesh. The pytest module (`test_multihost.py`) runs the same
computation single-process on 8 devices and asserts loss parity.
"""

import json
import os
import os.path as osp
import sys

import numpy as np

N_STEPS = 3
N_ITER = 2
GLOBAL_ROWS = 16
N_EVAL_IMAGES = 4
OBJS_PER_IMAGE = 3


def global_train_batch(seed=11, b=GLOBAL_ROWS, p=64, k=64):
    """Deterministic synthetic batch, identical in every process."""
    import jax.numpy as jnp

    from catre_tpu.geom import euler_to_mat, transform_normed_pts

    rng = np.random.default_rng(seed)
    canonical = rng.normal(size=(b, k, 3)).astype(np.float32)
    canonical /= np.abs(canonical).max(axis=(1, 2), keepdims=True) * 2
    scale = rng.uniform(0.1, 0.3, size=(b, 3)).astype(np.float32)
    euler = rng.uniform(-np.pi, np.pi, size=(b, 3)).astype(np.float32)
    R = np.asarray(euler_to_mat(jnp.asarray(euler)))
    t = np.stack([rng.uniform(-0.2, 0.2, b), rng.uniform(-0.2, 0.2, b),
                  rng.uniform(0.6, 1.2, b)], axis=1).astype(np.float32)
    pose = np.concatenate([R, t[:, :, None]], axis=2).astype(np.float32)
    pcl = np.asarray(transform_normed_pts(
        jnp.asarray(canonical), jnp.asarray(R), jnp.asarray(t), jnp.asarray(scale)))
    Km = np.tile(np.array([[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]],
                          dtype=np.float32), (b, 1, 1))
    return {
        "pcl": pcl.astype(np.float32), "obj_kps": canonical, "obj_pose": pose,
        "obj_scale": scale, "obj_mean_scales": scale, "K": Km,
        "sym_flag": np.zeros(b, dtype=bool), "valid": np.ones(b, dtype=bool),
    }


def eval_fixture(seed=23):
    """Synthetic gts + noisy preds for N_EVAL_IMAGES images (deterministic)."""
    rng = np.random.default_rng(seed)
    images = {}
    for i in range(N_EVAL_IMAGES):
        n = OBJS_PER_IMAGE
        RTs = np.tile(np.eye(4), (n, 1, 1))
        for j in range(n):
            a = rng.normal(size=(3, 3))
            q, r = np.linalg.qr(a)
            q = q * np.sign(np.diagonal(r))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            RTs[j, :3, :3] = q
            RTs[j, :3, 3] = rng.normal(size=3) * 0.2 + [0, 0, 1]
        scales = rng.uniform(0.1, 0.3, size=(n, 3))
        cls = rng.integers(1, 7, size=n).astype(np.int32)
        pred_RTs = RTs.copy()
        pred_RTs[:, :3, 3] += rng.normal(size=(n, 3)) * 0.01
        images[f"scene/{i}"] = {
            "gt": {"gt_class_ids": cls, "gt_RTs": RTs, "gt_scales": scales,
                   "gt_handle_visibility": np.ones(n, dtype=np.int32)},
            "pred": {"RTs": pred_RTs, "scales": scales * rng.uniform(0.95, 1.05, (n, 3)),
                     "cls": cls, "scores": rng.uniform(0.5, 1.0, n),
                     "bboxes": rng.uniform(1, 400, (n, 4))},
        }
    return images


def make_evaluator(images, n_iters=1):
    from catre_tpu.eval import CATREEvaluator

    ev = CATREEvaluator.__new__(CATREEvaluator)
    ev.n_iters = n_iters
    ev.output_dir = None
    ev.use_matches_for_pose = True
    ev._gts = {sid: rec["gt"] for sid, rec in images.items()}
    ev.reset()
    return ev


def process_images(ev, images, scene_ids):
    for sid in scene_ids:
        p = images[sid]["pred"]
        for it in range(ev.n_iters + 1):
            ev.process(sid, it, p["RTs"], p["scales"], p["cls"], p["scores"], p["bboxes"])


def run_train_steps(mesh, local_batch_fn):
    """N_STEPS train steps on the given mesh; returns per-step loss vectors."""
    import jax
    import jax.numpy as jnp

    from catre_tpu.engine.train import InputNoiseConfig, TrainState, make_train_step
    from catre_tpu.geom import axis_symmetry_rotation_bank
    from catre_tpu.losses import LossConfig
    from catre_tpu.models import CATREConfig, CATREDisRShared, init_params
    from catre_tpu.parallel import make_global_batch, replicate_tree
    from catre_tpu.solver import build_optimizer

    cfg = CATREConfig(num_pcl=64, num_kps=64)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 1e-3}})
    state = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))
    state = TrainState(
        replicate_tree(mesh, state.params),
        replicate_tree(mesh, state.opt_state),
        replicate_tree(mesh, state.step),
    )
    noise_cfg = InputNoiseConfig(bbox3d_aug_prob=0.0, rt_aug_prob=0.0)
    sym_bank = axis_symmetry_rotation_bank(max_sym_disc_step=0.2)
    step = make_train_step(model, cfg, LossConfig(), noise_cfg, tx, sym_bank,
                           n_iter=N_ITER)

    losses = []
    for i in range(N_STEPS):
        batch = make_global_batch(mesh, local_batch_fn())
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i), 1e-3)
        losses.append(np.asarray(jax.device_get(metrics["loss_total"])).tolist())
    return losses


def worker_main():
    rank, world, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

    import jax

    jax.config.update("jax_platforms", "cpu")
    # same machine-keyed persistent CPU compile cache as conftest.py — the
    # two workers' compiles dominate this test's wall time otherwise
    try:
        import hashlib

        with open("/proc/cpuinfo") as _f:
            _cpu = "".join(ln for ln in _f
                           if ln.startswith(("model name", "flags")))
        _fp = hashlib.sha1(_cpu.encode()).hexdigest()[:12]
        jax.config.update(
            "jax_compilation_cache_dir",
            osp.join(osp.dirname(__file__), "..", f".jax_cache_cpu_{_fp}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from catre_tpu.parallel import comm, make_mesh

    comm.init_dist(coordinator_address=f"127.0.0.1:{port}",
                   num_processes=world, process_id=rank)
    assert jax.device_count() == 4 * world, jax.device_count()

    # part 1: global-mesh train-step parity --------------------------------
    mesh = make_mesh()
    gbatch = global_train_batch()
    rows_local = GLOBAL_ROWS // world

    def local_batch():
        lo = rank * rows_local
        return {k: v[lo:lo + rows_local] for k, v in gbatch.items()}

    losses = run_train_steps(mesh, local_batch)

    # part 2: rank-partitioned eval + cross-process gather -----------------
    images = eval_fixture()
    scene_ids = sorted(images)
    sl = comm.inference_slice(len(scene_ids), rank, world)
    ev = make_evaluator(images)
    process_images(ev, images, scene_ids[sl])
    results = ev.evaluate(dump=False)

    # part 3: loader partition disjointness across ranks -------------------
    from catre_tpu.data.loader import CATRELoader, LoaderConfig

    dicts = [{"id": i} for i in range(13)]
    loader = CATRELoader.__new__(CATRELoader)
    loader.dicts = dicts
    loader.rank, loader.world_size = rank, world
    loader.seed = 42
    loader._pos = 0
    loader._perm_cache = None
    loader._epoch_cum = [0]
    loader._rep_factors = None
    import itertools

    n_take = len(range(rank, len(dicts), world))  # this rank's share of epoch 1
    first_epoch_ids = [rec["id"] for _, _, rec in
                       itertools.islice(loader._train_records(), n_take)]

    out = {
        "rank": rank,
        "losses": losses,
        "eval_empty": results == {},
        "summary": ({k: float(v) for k, v in results[1]["summary"].items()}
                    if results else None),
        "loader_ids": first_epoch_ids,
    }
    with open(osp.join(outdir, f"out_rank{rank}.json"), "w") as f:
        json.dump(out, f)
    comm.synchronize()
    print(f"rank {rank} done", flush=True)


if __name__ == "__main__":
    worker_main()
