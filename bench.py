"""Benchmark: object refinements/sec/chip on the flagship CATRE model
(1024 observed points + 1024 mean-shape keypoints, 4 refine iterations per
object — the full test-time workload of BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target rate of
50k obj/s on a v5e-8 => 6250 obj/s/chip (BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_OBJ_PER_SEC_PER_CHIP = 50_000 / 8.0


def main():
    import jax

    # persistent compilation cache: remote compiles in this image are slow
    # (minutes); repeat runs hit the disk cache
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from catre_tpu.engine.refiner import make_refine_fn
    from catre_tpu.models import CATREConfig, CATREDisRShared, init_params

    rng = np.random.default_rng(0)
    n_iter = 4
    results = {}

    variants = [("bf16_fused", jnp.bfloat16, True)]
    if os.environ.get("BENCH_FULL", ""):  # compare against the unfused path
        variants.append(("bf16", jnp.bfloat16, False))
    fused_failed = False
    for dtype_name, dtype, fused in variants:
        cfg = CATREConfig(dtype=dtype, fused_heads=fused)
        model = CATREDisRShared(cfg)
        params = init_params(model, cfg, jax.random.PRNGKey(0))
        refine = make_refine_fn(model, cfg, n_iter=n_iter)

        best = 0.0
        # keep the compile count low: remote compiles are slow in this image.
        # b=8192 amortizes the per-call dispatch overhead best: 6467 obj/s vs
        # 6317 at b=4096 and 6046 at b=2048 (see docs/PERF.md)
        batch_sizes = [8192]
        for b in batch_sizes:
            R = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
            t = np.tile(np.array([0, 0, 1.0], dtype=np.float32), (b, 1))
            pose = jnp.asarray(np.concatenate([R, t[:, :, None]], axis=2))
            scale = jnp.asarray(rng.uniform(0.1, 0.3, (b, 3)).astype(np.float32))
            pcl = jnp.asarray((rng.normal(size=(b, cfg.num_pcl, 3)) * 0.1 + t[:, None, :]).astype(np.float32))
            kps = jnp.asarray((rng.normal(size=(b, cfg.num_kps, 3)) * 0.3).astype(np.float32))
            K = jnp.asarray(np.tile(np.array(
                [[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]], np.float32), (b, 1, 1)))

            args = (params, pcl, kps, pose, scale, K, scale)

            def run_sync():
                # block_until_ready is unreliable through the axon relay:
                # force a scalar device->host fetch to synchronize.
                out = refine(*args)
                return float(out[0][-1, 0, 0, 0])

            try:
                run_sync()  # compile + warmup
            except Exception as e:  # kernel compile failure: skip variant
                print(f"variant {dtype_name} failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                fused_failed = fused_failed or fused
                break
            run_sync()

            n_rep = 5
            t0 = time.perf_counter()
            for _ in range(n_rep):
                run_sync()
            dt = (time.perf_counter() - t0) / n_rep
            rate = b / dt
            results[f"{dtype_name}_b{b}"] = rate
            best = max(best, rate)
        results[dtype_name] = best

    if fused_failed and "bf16" not in results:
        # fall back to the unfused flax path so the bench always reports
        os.environ["BENCH_FULL"] = "1"
        variants = [("bf16", jnp.bfloat16, False)]
        for dtype_name, dtype, fused in variants:
            cfg = CATREConfig(dtype=dtype, fused_heads=fused)
            model = CATREDisRShared(cfg)
            params = init_params(model, cfg, jax.random.PRNGKey(0))
            refine = make_refine_fn(model, cfg, n_iter=n_iter)
            b = 1024
            R = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
            t = np.tile(np.array([0, 0, 1.0], dtype=np.float32), (b, 1))
            args = (
                params,
                jnp.asarray((rng.normal(size=(b, cfg.num_pcl, 3)) * 0.1 + t[:, None, :]).astype(np.float32)),
                jnp.asarray((rng.normal(size=(b, cfg.num_kps, 3)) * 0.3).astype(np.float32)),
                jnp.asarray(np.concatenate([R, t[:, :, None]], axis=2)),
                jnp.asarray(rng.uniform(0.1, 0.3, (b, 3)).astype(np.float32)),
                jnp.asarray(np.tile(np.array(
                    [[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]], np.float32), (b, 1, 1))),
                jnp.asarray(rng.uniform(0.1, 0.3, (b, 3)).astype(np.float32)),
            )
            float(refine(*args)[0][-1, 0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(5):
                out = refine(*args)
                float(out[0][-1, 0, 0, 0])
            results["bf16"] = b / ((time.perf_counter() - t0) / 5)

    value = max(results.get("bf16_fused", 0.0), results.get("bf16", 0.0))
    print(
        json.dumps(
            {
                "metric": "object refinements/sec/chip (1024 pts, 4 iters)",
                "value": round(value, 1),
                "unit": "obj/s/chip",
                "vs_baseline": round(value / BASELINE_OBJ_PER_SEC_PER_CHIP, 3),
            }
        )
    )
    print(json.dumps({"detail": {k: round(v, 1) for k, v in results.items()}}), file=sys.stderr)


if __name__ == "__main__":
    main()
