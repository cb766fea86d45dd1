"""Breakdown profile of the cached group sampler (the pipeline's non-refine
device cost). Times ablated variants of the per-image windowed ball-crop at
the production pipeline shape (G images x M instances, 480x640 frames,
window=128, num_pcl=1024) to locate the hot part:

  full        : the shipped program (unpack + backproject + bbox + window +
                dist/radius + top_k + gather)
  no_topk     : selection replaced by iota (isolates jax.lax.top_k)
  no_bbox     : fixed window origin (isolates the full-frame mask bbox
                reductions)
  front_only  : unpack + backproject + bbox only (the per-image full-frame
                part, no per-instance window work)
  topk_only   : top_k over precomputed priorities at window shape

Run on the TPU with nothing else using the chip:
  python scripts/profile_sampler.py [G] [reps]

Timing per CLAUDE.md: the relay's block_until_ready returns early — sync by
fetching a scalar; ~30 ms dispatch floor per call, so report per-call time
over many reps of the SAME compiled program (floor included equally in all
variants; deltas are what matter).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

if __import__("os").environ.get("PROFILE_CPU"):
    # the axon plugin pins jax_platforms at import time; override via config
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

G = int(sys.argv[1]) if len(sys.argv) > 1 else 64
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
WS = int(sys.argv[3]) if len(sys.argv) > 3 else 128  # ball-crop window
M, H, W = 8, 480, 640
NPTS = 1024
RATIO = 3.0

rng = np.random.default_rng(0)


def make_inputs():
    depth = np.zeros((G, H, W), np.uint16)
    packed = np.zeros((G, H, W), np.uint32)
    poses = np.zeros((G, M, 3, 4), np.float32)
    scales = rng.uniform(0.15, 0.3, (G, M, 3)).astype(np.float32)
    K = np.array([[591.0, 0, 322.5], [0, 590.0, 244.5], [0, 0, 1]], np.float32)
    grid = [(r, c) for r in range(2) for c in range(4)]
    for g in range(G):
        for i, (r, c) in enumerate(grid):
            cy, cx = 120 + 240 * r, 80 + 160 * c
            z = float(rng.uniform(0.8, 1.2))
            half = 30
            depth[g, cy - half:cy + half, cx - half:cx + half] = int(z * 1000)
            packed[g, cy - half:cy + half, cx - half:cx + half] |= np.uint32(1 << i)
            t = np.array([(cx - K[0, 2]) / K[0, 0] * z,
                          (cy - K[1, 2]) / K[1, 1] * z, z], np.float32)
            poses[g, i, :, :3] = np.eye(3)
            poses[g, i, :, 3] = t
    Ks = np.tile(K, (G, 1, 1))
    return (jnp.asarray(depth), jnp.asarray(Ks), jnp.asarray(packed),
            jnp.asarray(poses), jnp.asarray(scales))


depths, Ks, packed, poses, scales = make_inputs()
keys = jax.random.split(jax.random.PRNGKey(0), G)
for x in (depths, Ks, packed, poses, scales, keys):
    x.block_until_ready()


def frontend(depth, K, packedw):
    depth = depth.astype(jnp.float32) / 1000.0
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    vy, vx = jnp.mgrid[0:H, 0:W]
    x = (vx - cx) * depth / fx
    y = (vy - cy) * depth / fy
    cloud = jnp.stack([x, y, depth], axis=-1)
    bits = jnp.arange(M, dtype=packedw.dtype)[:, None, None]
    masks = (jnp.right_shift(packedw[None, :, :], bits) & 1).astype(bool)
    return cloud, masks


def bbox_origin(mask):
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jnp.arange(H)
    cidx = jnp.arange(W)
    r_min = jnp.min(jnp.where(rows, ridx, H))
    r_max = jnp.max(jnp.where(rows, ridx, -1))
    c_min = jnp.min(jnp.where(cols, cidx, W))
    c_max = jnp.max(jnp.where(cols, cidx, -1))
    r0 = jnp.clip((r_min + r_max + 1 - WS) // 2, 0, H - WS)
    c0 = jnp.clip((c_min + c_max + 1 - WS) // 2, 0, W - WS)
    return r0, c0


def window_select(k, cloud, mask, pose, scale, r0, c0, use_topk=True):
    cloud_w = jax.lax.dynamic_slice(cloud, (r0, c0, 0), (WS, WS, 3))
    mask_w = jax.lax.dynamic_slice(mask, (r0, c0), (WS, WS))
    pts = cloud_w.reshape(-1, 3)
    valid = mask_w.reshape(-1) & (pts[:, 2] > 0)
    center = pose[:, 3]
    radius = jnp.maximum(RATIO * jnp.linalg.norm(pose[:, :3] @ scale), 0.05)
    dist = jnp.where(valid, jnp.linalg.norm(pts - center[None], axis=-1), 1e30)
    radii = radius * 1.1 ** jnp.arange(10, dtype=dist.dtype)
    counts = jnp.sum(dist[None, :] <= radii[:, None], axis=1)
    ok = counts >= 10
    eff = jnp.where(jnp.any(ok), radii[jnp.argmax(ok)], 1e30)
    inside = valid & (dist <= eff)
    n_in = jnp.sum(inside).astype(jnp.int32)
    pri = jnp.where(inside, jax.random.uniform(k, (WS * WS,)), 1e30)
    if use_topk:
        _, idx = jax.lax.top_k(-pri, NPTS)
        idx = idx.astype(jnp.int32)
    else:
        idx = jnp.arange(NPTS, dtype=jnp.int32)  # ablation: no selection
    j = jnp.arange(NPTS, dtype=jnp.int32)
    wrap = jnp.where(n_in > 0, j % jnp.maximum(n_in, 1), 0)
    idx = jnp.where(j < n_in, idx, idx[wrap])
    return pts[idx], idx, n_in


def variant(name):
    if name in ("fused", "fused_ps"):
        from catre_tpu.ops.sampling import batch_ball_crop_from_depth

        sel = "packed_sort" if name == "fused_ps" else "topk"
        bboxes_np = np.empty((G, M, 4), np.int32)
        grid = [(r, c) for r in range(2) for c in range(4)]
        for i, (r, c) in enumerate(grid):
            cy, cx = 120 + 240 * r, 80 + 160 * c
            bboxes_np[:, i] = (cy - 30, cy + 29, cx - 30, cx + 29)
        bboxes = jnp.asarray(bboxes_np)

        def one_img(k, depth, K, packedw, pose_i, scale_i, bbox_i):
            return batch_ball_crop_from_depth(
                k, depth, K, packedw, bbox_i, pose_i, scale_i,
                ratio=RATIO, num_points=NPTS, window_size=WS, selection=sel)

        @jax.jit
        def prog(keys, depths, Ks, packed, poses, scales):
            return jax.vmap(one_img)(keys, depths, Ks, packed, poses,
                                     scales, bboxes)

        return prog

    if name == "full" or name == "no_topk":
        use_topk = name == "full"

        def one_img(k, depth, K, packedw, pose_i, scale_i):
            cloud, masks = frontend(depth, K, packedw)
            ks = jax.random.split(k, M)

            def one_inst(kk, mask, pose, scale):
                r0, c0 = bbox_origin(mask)
                return window_select(kk, cloud, mask, pose, scale, r0, c0,
                                     use_topk)
            return jax.vmap(one_inst)(ks, masks, pose_i, scale_i)

    elif name == "no_bbox":
        def one_img(k, depth, K, packedw, pose_i, scale_i):
            cloud, masks = frontend(depth, K, packedw)
            ks = jax.random.split(k, M)

            def one_inst(kk, mask, pose, scale):
                return window_select(kk, cloud, mask, pose, scale,
                                     jnp.int32(100), jnp.int32(100), True)
            return jax.vmap(one_inst)(ks, masks, pose_i, scale_i)

    elif name == "front_only":
        def one_img(k, depth, K, packedw, pose_i, scale_i):
            cloud, masks = frontend(depth, K, packedw)

            def one_inst(mask):
                r0, c0 = bbox_origin(mask)
                return r0 + c0
            return jax.vmap(one_inst)(masks) + jnp.sum(cloud[0, 0])

    elif name == "topk_packed":
        # candidate replacement: priority and index packed into ONE u32
        # (pri<<14 | idx), single-operand ascending sort, take the first
        # NPTS — halves the sort payload vs top_k's (value, iota) pair
        def one_img(k, depth, K, packedw, pose_i, scale_i):
            ks = jax.random.split(k, M)

            ib = max(1, (WS * WS - 1).bit_length())

            def one_inst(kk):
                pri = jax.random.uniform(kk, (WS * WS,))
                key32 = ((pri * (1 << (32 - ib))).astype(jnp.uint32) << ib) | \
                    jnp.arange(WS * WS, dtype=jnp.uint32)
                sel = jax.lax.sort(key32)[:NPTS]
                return jnp.sum(sel & jnp.uint32((1 << ib) - 1))
            return jax.vmap(one_inst)(ks)

    elif name == "topk_only":
        def one_img(k, depth, K, packedw, pose_i, scale_i):
            ks = jax.random.split(k, M)

            def one_inst(kk):
                pri = jax.random.uniform(kk, (WS * WS,))
                _, idx = jax.lax.top_k(-pri, NPTS)
                return jnp.sum(idx)
            return jax.vmap(one_inst)(ks)

    elif name == "rng_only":
        # isolate the threefry uniform draw (the priority field)
        def one_img(k, depth, K, packedw, pose_i, scale_i):
            ks = jax.random.split(k, M)

            def one_inst(kk):
                return jnp.sum(jax.random.uniform(kk, (WS * WS,)))
            return jax.vmap(one_inst)(ks)

    elif name == "approx_topk":
        # TPU PartialReduce path: approximate top-k (recall<1 biases the
        # uniform-subset guarantee — measurement only)
        def one_img(k, depth, K, packedw, pose_i, scale_i):
            ks = jax.random.split(k, M)

            def one_inst(kk):
                pri = jax.random.uniform(kk, (WS * WS,))
                _, idx = jax.lax.approx_min_k(pri, NPTS)
                return jnp.sum(idx)
            return jax.vmap(one_inst)(ks)

    elif name == "csum_search":
        # sort-free exact selection: threshold the priority field at
        # ~NPTS/n_inside (overshoot guard), then compact the selected flags
        # with a cumsum + searchsorted inversion (14 vectorized gathers)
        # instead of a 16k sort. Measurement of the selection cost shape
        # only (the overshoot fallback path is not modeled here).
        def one_img(k, depth, K, packedw, pose_i, scale_i):
            ks = jax.random.split(k, M)

            def one_inst(kk):
                pri = jax.random.uniform(kk, (WS * WS,))
                n_in = jnp.int32(WS * WS // 3)
                tau = jnp.minimum((NPTS + 6.0 * jnp.sqrt(float(NPTS))) /
                                  jnp.maximum(n_in, 1), 1.0)
                sel = pri <= tau
                csum = jnp.cumsum(sel.astype(jnp.int32))
                slots = jnp.arange(1, NPTS + 1, dtype=jnp.int32)
                idx = jnp.searchsorted(csum, slots).astype(jnp.int32)
                return jnp.sum(idx)
            return jax.vmap(one_inst)(ks)
    else:
        raise ValueError(name)

    @jax.jit
    def prog(keys, depths, Ks, packed, poses, scales):
        return jax.vmap(one_img)(keys, depths, Ks, packed, poses, scales)

    return prog


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


for name in ["full", "fused", "fused_ps", "no_topk", "no_bbox", "front_only",
             "topk_only", "topk_packed", "rng_only", "approx_topk",
             "csum_search"]:
    prog = variant(name)
    out = prog(keys, depths, Ks, packed, poses, scales)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = prog(keys, depths, Ks, packed, poses, scales)
    sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:12s} {dt * 1e3:8.2f} ms/group  "
          f"{dt / G * 1e3:6.3f} ms/img", flush=True)
