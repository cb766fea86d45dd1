"""On-chip bit-exactness check for the MXU one-hot gathers
(`ops.sampling.gather_points_mxu` / `cycle_indices_mxu`).

The CPU test suite exercises only the native-gather fallback (the MXU form
is gated off on cpu), so the TPU path's exactness claim rests on THIS
check: run it on the real chip after any change to the gather/split code.
Covers duplicate indices, 1e-30/1e30-magnitude values, zeros, and every
n_inside cycling regime (0, < k, = k, > k).

Documented domain bounds (see gather_points_mxu docstring): values must be
bf16-range (|x| <= ~3.39e38) and not f32-subnormal (|x| >= 1.18e-38 or 0)
— backprojected depth points always are.

  python scripts/check_mxu_gather_exact.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from catre_tpu.ops.sampling import cycle_indices_mxu, gather_points_mxu

rng = np.random.default_rng(1)
N, K = 4096, 1024
p = (rng.normal(size=(N, 3)) *
     rng.choice([1e-8, 1e-3, 1.0, 1e4], size=(N, 1))).astype(np.float32)
p[0] = [1e-30, -1e30, 0.0]  # domain extremes (no bf16 overflow / subnormal)
idx = rng.integers(0, N, size=K).astype(np.int32)
idx[5] = idx[6]  # duplicate indices (cycling produces them)
pj, ij = jnp.asarray(p), jnp.asarray(idx)

a = np.asarray(jax.jit(lambda p, i: p[i])(pj, ij))
b = np.asarray(jax.jit(gather_points_mxu)(pj, ij))
ok_gather = bool((a.view(np.int32) == b.view(np.int32)).all())
print(f"gather_points_mxu bitexact: {ok_gather}")

ok_cycle = True
j = np.arange(K, dtype=np.int32)
for n_in in (0, 1, 7, 500, 1024, 3000):
    src = np.where(n_in > 0, j % max(n_in, 1), 0)
    ref = np.where(j < n_in, idx, idx[src])
    got = np.asarray(jax.jit(
        lambda i, n: cycle_indices_mxu(i, n, K, N))(ij, jnp.int32(n_in)))
    if not (ref == got).all():
        ok_cycle = False
        print(f"  cycle MISMATCH at n_inside={n_in}")
print(f"cycle_indices_mxu exact (all n_inside regimes): {ok_cycle}")
sys.exit(0 if (ok_gather and ok_cycle) else 1)
