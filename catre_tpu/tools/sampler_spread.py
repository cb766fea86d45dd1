"""Sampler-randomness parity-tolerance study (SURVEY §7.3 #2).

The real-checkpoint parity budget vs the reference is 0.5 mAP pt, and point
sampling is RNG on BOTH sides — ours draws ball-crop candidates with jax PRNG
(`ops/sampling.ball_crop_indices`), the reference with torch RNG
(`core/utils/cat_data_utils.py:289-320` `crop_ball_from_pts`, called by its
test path through `crop_ball_from_depth_image:380` with
center = t_est, radius = ratio * ||R_est @ scale_est||). Eval metrics
therefore carry a sampler-induced statistical term; this tool measures it on
a fixed synthetic split with FIXED on-disk init estimates (so the sampling
seed is the only varying input):

  arm A (ours): N full eval runs (loader -> refine -> NOCS mAP), varying
      only `CATRELoader(seed=...)` — the seed feeds exclusively the
      device ball-crop PRNG at test time (est init, no depth aug).
  arm B (reference): M runs where every instance's cloud is sampled on host
      by the IMPORTED reference `crop_ball_from_pts` over the identical
      candidate set (mask ∧ depth>0 pixels of the same backprojected cloud,
      same center/radius), fed through the same refine + evaluator.

Report (JSON + markdown): per-metric mean ± σ per arm, |Δmean| between arms,
and the iter-0 invariance check (init estimates are seed-independent, so the
iter-0 table must be bit-identical across runs). The parity claim holds when
both σ and |Δmean| are ≪ 0.5 pt.

    python -m catre_tpu.tools.sampler_spread --out DIR [--data-root DIR]
        [--frames 160] [--seeds 8] [--ref-seeds 4] [--ckpt ORBAX_DIR]
        [--n-iters 4] [--platform cpu|tpu]

DTYPE study (`--dtype-arms f32,bf16_fused,bf16_unfused`): measures the
bf16-compute term of the same parity budget (VERDICT r4 weak #2 — the
production `_tpu` config evaluates in bf16 while the checkpoint-parity
goldens are f32). The arms share the SAME loader seeds, so the sampled
clouds are bit-identical across arms and the per-seed metric deltas isolate
the compute-dtype effect; the report adds |Δmean| and max per-seed |Δ| of
every arm vs the first (reference) arm. Arm-B (reference sampler) is
skipped in this mode.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time


def _rodrigues(w):
    """Rotation matrix from a rotation vector (host numpy)."""
    import numpy as np

    th = float(np.linalg.norm(w))
    if th < 1e-12:
        return np.eye(3, dtype=np.float64)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]],
                 np.float64)
    return np.eye(3) + np.sin(th) * K + (1.0 - np.cos(th)) * (K @ K)


def inject_fixed_init(dicts, rot_std_deg=5.0, trans_std=0.01, scale_std=0.01,
                      seed=777):
    """Attach deterministic `pose_est`/`scale_est` to every annotation (the
    external-detection test shape, `data/nocs.py` merge path) so the eval's
    init is identical in every run regardless of the loader seed."""
    import numpy as np

    rng = np.random.default_rng(seed)
    for rec in dicts:
        for a in rec.get("annotations", []):
            R = np.asarray(a["pose"], np.float64)[:, :3]
            t = np.asarray(a["pose"], np.float64)[:, 3]
            w = rng.normal(0.0, np.deg2rad(rot_std_deg), 3)
            Rn = _rodrigues(w) @ R
            tn = t + rng.normal(0.0, trans_std, 3)
            pe = np.concatenate([Rn, tn[:, None]], axis=1).astype(np.float32)
            a["pose_est"] = pe
            a["scale_est"] = (np.asarray(a["scale"], np.float64)
                              * (1.0 + rng.normal(0.0, scale_std, 3))
                              ).astype(np.float32)
            a.setdefault("bbox_est", a.get("bbox"))
            a.setdefault("score", 1.0)
    return dicts


def _make_ref_loader_cls():
    """CATRELoader subclass whose device sampling stage is replaced by the
    IMPORTED reference sampler on host (same candidates/center/radius; the
    torch RNG of `crop_ball_from_pts` replaces our jax PRNG selection)."""
    import numpy as np

    sys.path.insert(0, "/root/reference")
    import torch  # noqa: F401  (reference sampler is torch)
    from core.utils.cat_data_utils import crop_ball_from_pts

    from ..data.loader import CATRELoader
    from ..geom.transforms import backproject

    class RefSamplerLoader(CATRELoader):
        ref_run_seed = 0  # distinct torch streams per arm-B run

        def _dispatch_group(self, items):
            return items  # host-only: nothing to launch

        def _finalize_group(self, items):
            out = []
            for g, record, data in items:
                data["pcl"] = self._ref_sample(g, data)
                data["pcl_idx"] = None
                data["n_inside"] = None
                out.append(self._post_device(g, record, data))
            return out

        def _ref_sample(self, g, data):
            import torch

            depth = np.asarray(data["depth_ship"])
            if depth.dtype == np.uint16:
                depth = depth.astype(np.float32) / 1000.0
            K = np.asarray(data["K"], np.float32)
            # identical backprojection math (f32 op order) as the device path
            cloud = np.asarray(backproject(depth, K))
            packed = np.asarray(data["masks_packed"])
            M = self.cfg.max_objs_per_image
            P = self.cfg.num_pcl
            pose, scale = self._crop_args(data)
            pcl = np.zeros((M, P, 3), np.float32)
            for i in range(M):
                if not data["valid"][i]:
                    continue
                if packed.ndim == 3:
                    mask = packed[i].astype(bool)
                else:
                    mask = ((packed >> np.uint64(i)) & np.uint64(1)).astype(bool) \
                        if packed.dtype == np.uint64 else (packed >> i) & 1 != 0
                cand = mask & (depth > 0)
                pts = cloud[cand].astype(np.float32)
                if pts.shape[0] == 0:
                    continue
                center = np.asarray(pose[i], np.float32)[:, 3]
                radius = float(self.cfg.depth_sample_ball_ratio
                               * np.linalg.norm(np.asarray(pose[i], np.float32)[:, :3]
                                                @ np.asarray(scale[i], np.float32)))
                torch.manual_seed(int(np.random.SeedSequence(
                    (self.ref_run_seed, g, i)).generate_state(1)[0]))
                idx = crop_ball_from_pts(
                    torch.from_numpy(pts), torch.from_numpy(center), radius,
                    num_points=P)
                pcl[i] = pts[np.asarray(idx)]
            return pcl

    return RefSamplerLoader


def _load_params(ckpt_path, model, mcfg):
    """Params from an orbax dir ({"params": ...} or a full TrainState tree),
    or a torch .pth/.pkl via the converter; None -> seeded random init."""
    import jax

    from ..models import init_params
    from ..utils import checkpoint as ckpt

    params = init_params(model, mcfg, jax.random.PRNGKey(0))
    if not ckpt_path:
        return params
    if ckpt_path.endswith((".pth", ".pkl")):
        return ckpt.load_torch_checkpoint(ckpt_path)
    try:
        return ckpt.load_checkpoint(ckpt_path, {"params": params})["params"]
    except Exception:
        from ..engine.train import TrainState  # full soak state (NamedTuple)
        import orbax.checkpoint as ocp

        with ocp.CheckpointManager(osp.abspath(ckpt_path)) as mngr:
            step = mngr.latest_step()
            restored = mngr.restore(step)
        tree = restored if isinstance(restored, dict) else restored.__dict__
        if "params" in tree:
            return tree["params"]
        raise


def run_dtype_study(args, dicts, lcfg, params, one_run):
    """bf16 parity term of the 0.5-pt budget (VERDICT r4 weak #2): same
    loader seeds per arm -> identical sampled clouds -> per-seed metric
    deltas isolate the compute dtype / kernel-fusion effect."""
    import numpy as np

    import jax.numpy as jnp

    from ..data.loader import CATRELoader
    from ..engine.refiner import make_refine_fn
    from ..models import CATREConfig, CATREDisRShared

    arm_specs = {
        "f32": (jnp.float32, False),
        "bf16_unfused": (jnp.bfloat16, False),
        "bf16_fused": (jnp.bfloat16, True),
    }
    arms = [a.strip() for a in args.dtype_arms.split(",") if a.strip()]
    for a in arms:
        if a not in arm_specs:
            raise ValueError(f"unknown dtype arm {a!r} (choices: {list(arm_specs)})")

    runs = {}
    for arm in arms:
        dtype, fused = arm_specs[arm]
        mcfg = CATREConfig(num_pcl=args.num_pcl, dtype=dtype, fused_heads=fused)
        model = CATREDisRShared(mcfg)
        refine = make_refine_fn(model, mcfg, n_iter=args.n_iters)
        runs[arm] = []
        for s in range(args.seeds):
            loader = CATRELoader(dicts, lcfg, phase="test",
                                 ims_per_batch=args.ims_per_batch,
                                 seed=s, num_workers=4)
            runs[arm].append(one_run(loader, f"{arm} seed={s}",
                                     refine_fn=refine))

    last = args.n_iters
    keys = list(runs[arms[0]][0][last].keys())
    base = arms[0]

    def stats(arm):
        vals = {k: np.array([r[last][k] for r in runs[arm]]) for k in keys}
        return {k: {"mean": float(v.mean()),
                    "std": float(v.std(ddof=1)) if len(v) > 1 else 0.0}
                for k, v in vals.items()}

    report = {"mode": "dtype", "frames": args.frames, "seeds": args.seeds,
              "ckpt": args.ckpt or "random-init", "n_iters": args.n_iters,
              "arms": {a: stats(a) for a in arms}}
    for arm in arms[1:]:
        deltas = {k: np.array([runs[arm][s][last][k] - runs[base][s][last][k]
                               for s in range(args.seeds)]) for k in keys}
        report[f"delta_{arm}_vs_{base}"] = {
            k: {"dmean": float(d.mean()), "abs_dmean": float(abs(d.mean())),
                "max_abs": float(np.abs(d).max())}
            for k, d in deltas.items()}

    os.makedirs(args.out, exist_ok=True)
    with open(osp.join(args.out, "dtype_spread.json"), "w") as f:
        json.dump(report, f, indent=1)

    hdr = "| metric | " + " | ".join(
        f"{a} mean±σ" for a in arms) + " | " + " | ".join(
        f"\\|Δ\\| {a} vs {base}" for a in arms[1:]) + " |"
    lines = [hdr, "|---|" + "---|" * (len(arms) + len(arms) - 1)]
    for k in keys:
        row = [k]
        for a in arms:
            s = report["arms"][a][k]
            row.append(f"{s['mean']:.2f} ± {s['std']:.3f}")
        for a in arms[1:]:
            d = report[f"delta_{a}_vs_{base}"][k]
            row.append(f"{d['abs_dmean']:.3f} (max {d['max_abs']:.3f})")
        lines.append("| " + " | ".join(row) + " |")
    md = "\n".join(lines)
    with open(osp.join(args.out, "dtype_spread.md"), "w") as f:
        f.write(md + "\n")
    print(md, flush=True)
    return report


def run_study(args):
    import numpy as np

    import jax.numpy as jnp

    from ..data.loader import CATRELoader, LoaderConfig
    from ..data.nocs import _DATASET_REGISTRY, NOCSDataset
    from ..engine.refiner import make_refine_fn
    from ..eval.evaluator import CATREEvaluator, run_inference
    from ..models import CATREConfig, CATREDisRShared
    from .synth_nocs import generate_split

    root = osp.join(args.data_root, "REAL")
    marker = osp.join(root, "real_test_list_all.txt")
    if not osp.exists(marker):
        print(f"[spread] generating {args.frames} synthetic test frames ...",
              flush=True)
        generate_split(root, split="real_test", n_frames=args.frames,
                       n_objs=6, seed=123)
    # name MUST contain "real"+"test": NOCSDataset derives split/"real_test"
    # and REAL intrinsics from the name (data/nocs.py:50-59) — a name without
    # "real" selects the CAMERA "val" split and silently builds 0 records.
    _DATASET_REGISTRY["nocs_spread_real_test"] = NOCSDataset(
        "nocs_spread_real_test", image_root=root, use_cache=True)
    dicts = _DATASET_REGISTRY["nocs_spread_real_test"]()
    if not dicts:
        raise RuntimeError(f"synthetic split under {root} built 0 records")
    inject_fixed_init(dicts)

    lcfg = LoaderConfig(num_pcl=args.num_pcl, max_objs_per_image=8, aug_depth=False,
                        init_pose_type_test="est", bbox_type_test="est",
                        cache_decoded="ram")
    import jax

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    mcfg = CATREConfig(num_pcl=args.num_pcl,
                       dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                       fused_heads=on_tpu)
    model = CATREDisRShared(mcfg)
    params = _load_params(args.ckpt, model, mcfg)
    refine = make_refine_fn(model, mcfg, n_iter=args.n_iters)

    def one_run(loader, tag, refine_fn=None, run_params=None):
        ev = CATREEvaluator(dicts, n_iters=args.n_iters, output_dir=None)
        t0 = time.perf_counter()
        run_inference(refine_fn or refine, run_params if run_params is not None
                      else params, iter(loader), ev, n_iters=args.n_iters,
                      warmup=0, compute_probe_every=0)
        res = ev.evaluate(dump=False)
        print(f"[spread] {tag}: {time.perf_counter() - t0:.1f}s", flush=True)
        return {i: r["summary"] for i, r in res.items()}

    if getattr(args, "dtype_arms", ""):
        return run_dtype_study(args, dicts, lcfg, params, one_run)

    runs_a = []
    for s in range(args.seeds):
        loader = CATRELoader(dicts, lcfg, phase="test",
                             ims_per_batch=args.ims_per_batch,
                             seed=s, num_workers=4)
        runs_a.append(one_run(loader, f"ours seed={s}"))

    runs_b = []
    if args.ref_seeds > 0:
        RefLoader = _make_ref_loader_cls()
        for s in range(args.ref_seeds):
            loader = RefLoader(dicts, lcfg, phase="test",
                               ims_per_batch=args.ims_per_batch,
                               seed=s, num_workers=4)
            loader.ref_run_seed = 1000 + s
            runs_b.append(one_run(loader, f"reference seed={s}"))

    # ---- report ------------------------------------------------------
    last = args.n_iters
    keys = list(runs_a[0][last].keys())

    def table(runs):
        vals = {k: np.array([r[last][k] for r in runs]) for k in keys}
        return {k: {"mean": float(v.mean()),
                    "std": float(v.std(ddof=1)) if len(v) > 1 else 0.0,
                    "min": float(v.min()), "max": float(v.max())}
                for k, v in vals.items()}

    # iter-0 invariance: the init is fixed on disk, so iter-0 metrics must be
    # identical across every run of both arms (sampling only affects refine)
    iter0 = np.array([[r[0][k] for k in keys] for r in runs_a + runs_b])
    iter0_spread = float(np.ptp(iter0, axis=0).max())

    ta = table(runs_a)
    report = {
        "frames": args.frames, "seeds": args.seeds,
        "ref_seeds": args.ref_seeds, "ckpt": args.ckpt or "random-init",
        "n_iters": args.n_iters, "iter0_max_ptp": iter0_spread,
        # iter-0 scores the FIXED on-disk inits (~5 deg/1 cm/1% off gt) — a
        # healthy scoring path shows high values here; all-zeros would mean
        # broken scoring even though ptp == 0 still holds
        "iter0": dict(runs_a[0][0]),
        "ours": ta,
    }
    if runs_b:
        tb = table(runs_b)
        report["reference"] = tb
        report["abs_dmean"] = {k: abs(ta[k]["mean"] - tb[k]["mean"])
                               for k in keys}
    os.makedirs(args.out, exist_ok=True)
    with open(osp.join(args.out, "sampler_spread.json"), "w") as f:
        json.dump(report, f, indent=1)

    lines = ["| metric | ours mean±σ (N=%d) | ref mean±σ (N=%d) | \\|Δmean\\| |"
             % (args.seeds, args.ref_seeds),
             "|---|---|---|---|"]
    for k in keys:
        a = ta[k]
        if runs_b:
            b = report["reference"][k]
            d = report["abs_dmean"][k]
            lines.append(f"| {k} | {a['mean']:.2f} ± {a['std']:.3f} | "
                         f"{b['mean']:.2f} ± {b['std']:.3f} | {d:.3f} |")
        else:
            lines.append(f"| {k} | {a['mean']:.2f} ± {a['std']:.3f} | — | — |")
    md = "\n".join(lines)
    with open(osp.join(args.out, "sampler_spread.md"), "w") as f:
        f.write(md + "\n")
    print(md, flush=True)
    print("[spread] iter-0 (fixed init):",
          {k: round(v, 2) for k, v in report["iter0"].items()}, flush=True)
    print(f"[spread] iter-0 invariance max ptp = {iter0_spread:g} "
          f"(must be 0)", flush=True)
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--data-root", default="")
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--ref-seeds", type=int, default=4)
    p.add_argument("--ckpt", default="")
    p.add_argument("--n-iters", type=int, default=4)
    p.add_argument("--ims-per-batch", type=int, default=16)
    p.add_argument("--num-pcl", type=int, default=1024,
                   help="cloud/kps size (production 1024; small for smokes)")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--dtype-arms", default="", help=(
        "comma list of f32,bf16_unfused,bf16_fused — switches to the dtype "
        "study (same seeds per arm; reports per-metric deltas vs the first)"))
    args = p.parse_args(argv)
    if not args.data_root:
        args.data_root = osp.join(args.out, "data")

    if args.platform == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.setdefault(
            "XLA_FLAGS",
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1")
    if "CATRE_DATA_ROOT" not in os.environ and osp.isdir("/root/reference/datasets"):
        os.environ["CATRE_DATA_ROOT"] = "/root/reference/datasets"
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_cpu_spread"
                      if args.platform == "cpu" else "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    run_study(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
