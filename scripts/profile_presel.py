"""Marginal device cost of the presampled-eval SELECTION program.

The per-call host/dispatch floor through the axon relay (~4 ms sustained)
masks small-program device costs when timing back-to-back dispatches at the
production group size (G=32). This probe times each selection variant at
G=32 AND G=256 in ONE dispatch; the slope ((t256 - t32) / 7) is the pure
per-32-group device cost, floor-free.

Variants:
  presel      : the shipped selection (priorities + top_k + flat-idx + gather)
  no_topk     : top_k replaced by iota slice (isolates jax.lax.top_k)
  no_rng      : priorities from iota bit-twiddle (isolates threefry)
  no_gather   : returns indices only (isolates the (B,1024,3) point gather)
  packed_sort : single-operand u32 sort instead of top_k

Run on the TPU with nothing else on the chip:
  python scripts/profile_presel.py [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
M, WS, NPTS, W_IMG = 8, 64, 1024, 640
N = WS * WS

rng = np.random.default_rng(0)
ROWS = 256  # candidate-stack rows resident (like the real 2752-frame cache)

pts = jnp.asarray(rng.normal(size=(ROWS, M, N, 3)).astype(np.float32))
inside = jnp.asarray(rng.random((ROWS, M, N)) < 0.5)
n_inside = jnp.sum(inside, axis=-1).astype(jnp.int32)
origin = jnp.zeros((ROWS, M, 2), jnp.int32)
for x in (pts, inside, n_inside, origin):
    x.block_until_ready()


def make_prog(mode, g):
    from catre_tpu.ops.sampling import select_inside

    if mode == "prod":
        # the actual shipped selection program (MXU one-hot gathers)
        from catre_tpu.ops.sampling import batch_select_from_candidates

        def one_img(key, i):
            return batch_select_from_candidates(
                key, pts[i], inside[i], n_inside[i], origin[i],
                num_points=NPTS, img_w=W_IMG, wsw=WS)

        @jax.jit
        def prog(keys, rows):
            return jax.vmap(one_img)(keys, rows)

        return prog

    def one_inst(k, p, ins, n_in):
        if mode == "no_rng":
            pri = jnp.where(
                ins, (jnp.arange(N, dtype=jnp.uint32) *
                      jnp.uint32(2654435761)).astype(jnp.float32), 1e30)
            _, idx = jax.lax.top_k(-pri, NPTS)
            idx = idx.astype(jnp.int32)
        elif mode == "no_topk":
            pri = jnp.where(ins, jax.random.uniform(k, (N,)), 1e30)
            idx = jnp.argmin(pri) + jnp.arange(NPTS, dtype=jnp.int32)
        elif mode == "packed_sort":
            pri = jnp.where(ins, jax.random.uniform(k, (N,)), 1e30)
            ib = max(1, (N - 1).bit_length())
            key32 = ((pri * (1 << (32 - ib))).astype(jnp.uint32) << ib) | \
                jnp.arange(N, dtype=jnp.uint32)
            idx = (jax.lax.sort(key32)[:NPTS] &
                   jnp.uint32((1 << ib) - 1)).astype(jnp.int32)
        else:  # presel / no_gather / onehot_gather: shipped select_inside
            idx = select_inside(k, ins, n_in, NPTS, "topk")
        if mode == "no_gather":
            return idx, n_in
        if mode in ("onehot_gather", "onehot_hi"):
            # lane-friendly MXU gather: (NPTS, N) one-hot from iota @ (N, 3)
            # — the direct p[idx] gather moves (1, 3)-slices, hostile to the
            # (8, 128) tile. HIGHEST precision is bit-exact vs p[idx]
            # (verified on-chip); default (single-pass bf16) is not.
            oh = (idx[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
            prec = (jax.lax.Precision.HIGHEST if mode == "onehot_hi"
                    else jax.lax.Precision.DEFAULT)
            return jax.lax.dot(oh, p, precision=prec), idx, n_in
        if mode == "no_cycle":
            # select_inside minus the wrap/cycling gather (isolates it)
            pri = jnp.where(ins, jax.random.uniform(k, (N,)), 1e30)
            _, idx = jax.lax.top_k(-pri, NPTS)
            idx = idx.astype(jnp.int32)
            return p[idx], idx, n_in
        return p[idx], idx, n_in

    def one_img(key, i):
        keys = jax.random.split(key, M)
        return jax.vmap(one_inst)(keys, pts[i], inside[i], n_inside[i])

    @jax.jit
    def prog(keys, rows):
        return jax.vmap(one_img)(keys, rows)

    return prog


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


key0 = jax.random.PRNGKey(0)
modes = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "presel", "no_topk", "no_rng", "no_gather", "packed_sort",
    "onehot_gather", "onehot_hi", "no_cycle"]
for mode in modes:
    times = {}
    for g in (32, 256):
        keys = jax.random.split(key0, g)
        rows = jnp.arange(g, dtype=jnp.int32) % ROWS
        prog = make_prog(mode, g)
        out = prog(keys, rows)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = prog(keys, rows)
        sync(out)
        times[g] = (time.perf_counter() - t0) / REPS
    slope = (times[256] - times[32]) / 7.0
    print(f"{mode:12s} g32 {times[32]*1e3:7.2f} ms  g256 {times[256]*1e3:7.2f} ms"
          f"  -> device/32-group {slope*1e3:6.2f} ms", flush=True)
