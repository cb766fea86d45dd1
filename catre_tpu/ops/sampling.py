"""Device-side point-cloud sampling (jit/vmap friendly, static shapes).

Behavioral reference: `core/utils/cat_data_utils.py` — `crop_ball_from_pts`
(:289, radius-growth loop + duplicate-pad + random choice),
`crop_ball_from_depth_image` (:380, radius = ratio * ||R @ scale||),
`sample_bp_depth` (:209, mask ∧ depth>0 flatten-gather), `random_sample`
(:314), `farthest_point_sample` (:322).

TPU-native design: the reference's dynamic-shape host gather becomes a
masked top-k over a random priority field — fixed 1024-point output, no
data-dependent shapes, vmappable across instances.  Selection is uniform
without replacement among in-ball points (matching the reference's
randperm); when fewer than `num_points` qualify, indices cycle. Deliberate
deviation in that scarce case: our cycling gives every candidate a
balanced ±1 repeat count and never drops one, while the reference doubles
the index list and randperm-samples from it (`crop_ball_from_pts:300-307`
+ `random_sample:314-320`) — random repeat counts, and a candidate can
lose all its copies. Same candidate SET semantics, slightly different
duplicate distribution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e30

# Tests flip this (monkeypatch) to exercise the MXU one-hot gather form on
# the CPU backend, where it is otherwise gated off as the slower choice —
# the bf16 split-exactness argument is backend-independent and the CPU
# compiler runs the same excess-precision/algebraic rewrites the barriers
# defend against. The on-chip run (scripts/check_mxu_gather_exact.py)
# remains the authoritative TPU check.
_FORCE_MXU_FORM = False


def _onehot_bf16(src: jnp.ndarray, n: int) -> jnp.ndarray:
    """(k, n) bf16 one-hot rows from integer indices (iota compare — Mosaic
    prefers one-hots built from iota over lane-splitting reshapes)."""
    return (src[:, None] == jnp.arange(n, dtype=src.dtype)[None, :]
            ).astype(jnp.bfloat16)


def _dot_oh(oh: jnp.ndarray, comp: jnp.ndarray) -> jnp.ndarray:
    """One bf16 MXU pass of the one-hot gather, f32 accumulation. With a
    0/1 one-hot and a bf16-EXACT component, every product and the
    single-nonzero accumulation are exact."""
    return jax.lax.dot_general(oh, comp.astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def gather_points_mxu(pts: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """`pts[idx]` as one-hot MXU matmuls — bit-exact vs the native gather
    and ~4x faster for window-sized point tables, where the native
    (1, 3)-slice gather is hostile to the (8, 128) TPU tile (docs/PERF.md
    round-5 presel probe: the gather is 3.24 ms of the 6.44 ms 32-image
    group selection).

    Exactness: the f32 points are split into three bf16-exact components
    (hi = bf16(p), mid = bf16(p - hi), lo = the <=8-bit residual — a 24-bit
    f32 mantissa fits 3x8-bit bf16 extractions); each component column is
    multiplied by an exact one-hot 1.0 with f32 accumulation over a single
    nonzero, and hi + mid + lo reconstructs p exactly. One-sided split (the
    one-hot side is already bf16-exact), so 3 component sets instead of
    Precision.HIGHEST's generic 6 — measured 5.40 vs 3.98 ms/group for the
    full selection. The three components ride as NINE COLUMNS OF ONE dot
    (columns of a matmul never interact, so per-column exactness is
    unchanged) instead of three separate dots — one traversal of the big
    (num_points, n) one-hot operand instead of three (measured on-chip,
    floor-free slope: full selection 3.60 -> 1.94 ms per 32-image group,
    docs/PERF.md round-5). Caveat:
    f32-subnormal inputs (<1.2e-38) would flush in bf16; backprojected
    depth points are 0 or >= mm scale. Verified bitwise on-chip incl.
    1e-30/1e30-magnitude values and duplicate indices
    (scripts/check_mxu_gather_exact.py).

    Falls back to the native gather on CPU (tests; the matmul form is the
    slower one there) and for large tables (a full-frame cloud would make
    the one-hot row 300k wide)."""
    n = pts.shape[0]
    if (jax.default_backend() == "cpu" and not _FORCE_MXU_FORM) or n > 16384:
        return pts[idx]
    oh = _onehot_bf16(idx, n)
    # Dekker-style one-sided split. The barriers on the bf16 intermediates
    # are load-bearing (observed on-chip): without them XLA's
    # excess-precision rewrite simplifies convert(convert(x, bf16), f32)
    # -> x, making every residual zero. (The single-dot form needs no
    # barrier against dot-merging — there is only one dot to merge.)
    hb = jax.lax.optimization_barrier(pts.astype(jnp.bfloat16))
    r1 = pts - hb.astype(jnp.float32)
    mb = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mb.astype(jnp.float32)).astype(jnp.bfloat16)
    comp = jnp.concatenate([hb, mb, lo], axis=1)  # (n, 9) bf16-exact
    d = _dot_oh(oh, comp)  # (k, 9) f32, each column exact
    return d[:, 0:3] + d[:, 3:6] + d[:, 6:9]


def cycle_indices_mxu(idx: jnp.ndarray, n_inside: jnp.ndarray,
                      num_points: int, table_n: int) -> jnp.ndarray:
    """Duplicate-pad cycling `where(j < n, idx[j], idx[j % n])` without the
    native 1D gather (measured 2.46 ms of the 6.44 ms 32-image group
    selection — tiny dynamic gathers scalarize on TPU). The index values
    (< table_n) split into two 8-bit halves, each bf16-exact, gathered by a
    (k, k) one-hot in ONE two-column MXU pass and recombined exactly. CPU
    (tests) and tables over 2^16 (full-frame clouds: idx would overflow the
    two halves) fall back to the native gather."""
    j = jnp.arange(num_points, dtype=jnp.int32)
    src = jnp.where(n_inside > 0, j % jnp.maximum(n_inside, 1), 0)
    if (jax.default_backend() == "cpu" and not _FORCE_MXU_FORM) or table_n > 65536:
        return jnp.where(j < n_inside, idx, idx[src])
    oh = _onehot_bf16(src, num_points)
    halves = jnp.stack([idx >> 8, idx & 0xFF], axis=1)  # (k, 2), each < 256
    g = _dot_oh(oh, halves)  # exact small integers in f32
    cycled = (g[:, 0].astype(jnp.int32) << 8) | g[:, 1].astype(jnp.int32)
    return jnp.where(j < n_inside, idx, cycled)


def ball_crop_indices(key, pts: jnp.ndarray, valid: jnp.ndarray, center: jnp.ndarray,
                      radius: jnp.ndarray, num_points: int, min_inside: int = 10,
                      growth: float = 1.1, growth_steps: int = 10,
                      selection: str = "topk") -> tuple:
    """Select `num_points` indices of `pts` inside a ball around `center`.

    Args:
      pts: (N, 3) candidate points (flattened organized cloud)
      valid: (N,) bool — candidate validity (instance mask ∧ depth>0)
      center: (3,) ball center (initial translation estimate)
      radius: scalar initial radius (ratio * ||R @ scale||)
      num_points: output size (static)
      selection: "topk" (exact f32 top_k over random priorities) or
        "packed_sort" (priority quantized into the high bits of ONE u32 with
        the candidate index in the low bits, single-operand ascending sort —
        half the sort payload of top_k's (value, iota) pair; ties at the
        32-idx_bits-bit priority granularity break by candidate order, still
        uniform-without-replacement to ~2^-18 for a 128^2 window). Both keep
        the exact n_inside semantics and take EVERY inside point when
        n_inside <= num_points.
    Returns:
      (idx (num_points,) int32, n_inside scalar int32)
    """
    inside, n_inside = ball_inside_mask(pts, valid, center, radius,
                                        min_inside, growth, growth_steps)
    idx = select_inside(key, inside, n_inside, num_points, selection)
    return idx, n_inside


def ball_inside_mask(pts, valid, center, radius, min_inside: int = 10,
                     growth: float = 1.1, growth_steps: int = 10):
    """Deterministic half of the ball-crop: the in-ball candidate mask.
    Pure function of the record (pose/scale estimate, depth, mask) — the
    frozen-eval path precomputes it once per record (`CATRELoader`
    presampled candidates) and replays only `select_inside` per pass.
    Returns (inside (N,) bool, n_inside scalar int32)."""
    dist = jnp.linalg.norm(pts - center[None, :], axis=-1)
    dist = jnp.where(valid, dist, BIG)

    radius = jnp.maximum(radius, 0.05)
    # radius-growth loop (`crop_ball_from_pts:289-301`): radii r*g^k, pick the
    # smallest k with >= min_inside points. If NO radius reaches min_inside
    # the reference keeps whatever the largest grown radius holds (its loop
    # exits with idx = in-ball at r*g^(G-1)); only a completely EMPTY largest
    # ball falls back to every valid point (`:297-298` distance <= 1e9).
    radii = radius * growth ** jnp.arange(growth_steps, dtype=dist.dtype)  # (G,)
    counts = jnp.sum(dist[None, :] <= radii[:, None], axis=1)  # (G,)
    ok = counts >= min_inside
    k_first = jnp.argmax(ok)  # first True (0 if none — fixed below)
    any_ok = jnp.any(ok)
    eff_radius = jnp.where(any_ok, radii[k_first],
                           jnp.where(counts[-1] > 0, radii[-1], BIG))

    inside = valid & (dist <= eff_radius)
    n_inside = jnp.sum(inside).astype(jnp.int32)
    return inside, n_inside


def select_inside(key, inside, n_inside, num_points: int,
                  selection: str = "topk"):
    """Randomized half of the ball-crop: uniform-without-replacement among
    the `inside` candidates via random priorities, cycling when fewer than
    `num_points` qualify. Identical draw (same key, same shape) and identical
    op order as the fused path — composing `ball_inside_mask` +
    `select_inside` is bit-equal to the original single function."""
    n = inside.shape[0]
    priority = jax.random.uniform(key, (n,))
    if selection == "packed_sort":
        idx_bits = max(1, (n - 1).bit_length())
        pri_bits = 32 - idx_bits
        if pri_bits < 12:
            raise ValueError(f"packed_sort needs n <= 2^20, got {n}")
        pq = (priority * (1 << pri_bits)).astype(jnp.uint32)
        # cap below the all-ones sentinel so an inside key can never equal it
        pq = jnp.minimum(pq, jnp.uint32((1 << pri_bits) - 2))
        key32 = jnp.where(inside,
                          (pq << idx_bits) | jnp.arange(n, dtype=jnp.uint32),
                          jnp.uint32(0xFFFFFFFF))
        sel = jax.lax.sort(key32)[:num_points]
        idx = (sel & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    else:
        priority = jnp.where(inside, priority, BIG)
        _, idx = jax.lax.top_k(-priority, num_points)
        idx = idx.astype(jnp.int32)

    # cycle when fewer than num_points qualify (duplicate-pad semantics);
    # MXU one-hot form on TPU (the native tiny gather costs ~2.5 ms per
    # 32-image group — docs/PERF.md round-5 presel probe)
    idx = cycle_indices_mxu(idx, n_inside, num_points, n)
    return idx


def crop_ball_from_cloud(key, pts, valid, pose, scale, ratio: float, num_points: int,
                         selection: str = "topk"):
    """Full ball-crop: radius from the pose/scale estimate
    (`crop_ball_from_depth_image:380-400`), then index selection + gather.

    Args:
      pts: (N, 3); valid: (N,); pose: (3, 4); scale: (3,)
    Returns:
      (sampled (num_points, 3), idx, n_inside)
    """
    center = pose[:, 3]
    radius = ratio * jnp.linalg.norm(pose[:, :3] @ scale)
    idx, n_inside = ball_crop_indices(key, pts, valid, center, radius, num_points,
                                      selection=selection)
    return gather_points_mxu(pts, idx), idx, n_inside


def _window_origin(r_min, r_max, c_min, c_max, wsh: int, wsw: int,
                   h: int, w: int):
    """Mask-bbox-centered window origin, clamped per dimension. The single
    definition keeps the materialized-cloud and fused from-depth windowed
    paths bit-identical (CATRE_DISABLE_FUSED_WINDOW A/B contract)."""
    r0 = jnp.clip((r_min + r_max + 1 - wsh) // 2, 0, h - wsh)
    c0 = jnp.clip((c_min + c_max + 1 - wsw) // 2, 0, w - wsw)
    return r0, c0


def _window_to_flat_idx(idx_w, r0, c0, wsw: int, w: int):
    """Window-local index -> flat H*W pixel index (nocs/rgb alignment)."""
    return ((r0 + idx_w // wsw) * w + (c0 + idx_w % wsw)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("ratio", "num_points", "fps_sample",
                                   "window_size"))
def batch_ball_crop(key, cloud: jnp.ndarray, masks: jnp.ndarray, poses: jnp.ndarray,
                    scales: jnp.ndarray, ratio: float, num_points: int,
                    fps_sample: bool = False, window_size: int = 0):
    """Per-instance ball-crop over one image's organized cloud.

    Args:
      cloud: (H, W, 3) backprojected cloud (z == depth)
      masks: (I, H, W) bool per-instance masks
      poses: (I, 3, 4) initial poses; scales: (I, 3)
      fps_sample: FPS instead of random choice among in-ball points
        (the INPUT.FPS_SAMPLE ablation, `crop_ball_from_pts:304-307`)
      window_size: when > 0, each instance's candidate field is a
        window_size^2 window centered on ITS OWN mask bbox instead of the
        full H*W image — identical semantics whenever the window covers the
        mask (candidates are mask∧depth pixels; the mask has no pixels
        outside its bbox) at a fraction of the per-instance top-k/reduction
        cost. Masks larger than the window lose border pixels (use 0 or a
        bigger window for such datasets).
    Returns:
      (pcls (I, num_points, 3), idx (I, num_points) flat pixel indices into
       the H*W cloud — for gathering aligned per-point data (nocs, rgb) —
       and n_inside (I,))
    """
    n_inst = masks.shape[0]
    h, w = cloud.shape[:2]
    keys = jax.random.split(key, n_inst)

    if window_size and not fps_sample and (window_size < h or window_size < w):
        # per-dim clamp: a window between the two image dims slices the full
        # extent of the smaller dim instead of overrunning it
        wsh, wsw = min(int(window_size), h), min(int(window_size), w)

        def one_windowed(k, mask, pose, scale):
            # mask bbox center -> clamped window origin (device-side: the
            # host never sees the masks in the cached path)
            rows = jnp.any(mask, axis=1)
            cols = jnp.any(mask, axis=0)
            ridx = jnp.arange(h)
            cidx = jnp.arange(w)
            r_min = jnp.min(jnp.where(rows, ridx, h))
            r_max = jnp.max(jnp.where(rows, ridx, -1))
            c_min = jnp.min(jnp.where(cols, cidx, w))
            c_max = jnp.max(jnp.where(cols, cidx, -1))
            r0, c0 = _window_origin(r_min, r_max, c_min, c_max, wsh, wsw, h, w)
            cloud_w = jax.lax.dynamic_slice(cloud, (r0, c0, 0), (wsh, wsw, 3))
            mask_w = jax.lax.dynamic_slice(mask, (r0, c0), (wsh, wsw))
            pts = cloud_w.reshape(-1, 3)
            valid = mask_w.reshape(-1) & (pts[:, 2] > 0)
            sampled, idx_w, n_in = crop_ball_from_cloud(
                k, pts, valid, pose, scale, ratio, num_points)
            idx = _window_to_flat_idx(idx_w, r0, c0, wsw, w)
            return sampled, idx, n_in

        return jax.vmap(one_windowed)(keys, masks, poses, scales)

    pts = cloud.reshape(-1, 3)
    depth_ok = pts[:, 2] > 0

    def one(k, mask, pose, scale):
        valid = mask.reshape(-1) & depth_ok
        if fps_sample:
            # oversample randomly in-ball, then FPS among the kept points
            center = pose[:, 3]
            radius = ratio * jnp.linalg.norm(pose[:, :3] @ scale)
            cand_idx, n_in = ball_crop_indices(
                k, pts, valid, center, radius, num_points=4 * num_points
            )
            cand = pts[cand_idx]
            cand_valid = jnp.arange(4 * num_points) < jnp.minimum(n_in, 4 * num_points)
            fps_idx = farthest_point_indices(cand, num_points, valid=cand_valid)
            return cand[fps_idx], cand_idx[fps_idx], n_in
        sampled, idx, n_in = crop_ball_from_cloud(k, pts, valid, pose, scale, ratio, num_points)
        return sampled, idx, n_in

    return jax.vmap(one)(keys, masks, poses, scales)


def batch_ball_crop_from_depth(key, depth: jnp.ndarray, K: jnp.ndarray,
                               packed: jnp.ndarray, mask_bbox: jnp.ndarray,
                               poses: jnp.ndarray, scales: jnp.ndarray,
                               ratio: float, num_points: int,
                               window_size: int, selection: str = "topk"):
    """Windowed ball-crop straight from the raw per-image tensors — the
    full-frame intermediates of `batch_ball_crop` (unpacked (M, H, W) bool
    masks, the (H, W, 3) backprojected cloud, and the per-instance
    full-frame mask-bbox reductions) never materialize. Each instance
    slices its own window of the u16/f32 depth map and the bit-packed mask
    word, converts + backprojects the 16k-window pixels in place, and runs
    the identical selection. Bit-identical to `batch_ball_crop(...,
    window_size=ws)` fed `backproject(f32(depth)/1000, K)` and unpacked
    masks (same f32 op order, same RNG stream) — pinned by
    tests/test_sampling.py::test_ball_crop_from_depth_bit_identical.

    Args:
      depth: (H, W) uint16 millimeters (converted in-window) or f32 meters
      K: (3, 3) intrinsics
      packed: (H, W) bit-packed mask word (uint8/16/32, bit i = instance i)
        or the unpacked (M, H, W) bool stack (M > 32 fallback)
      mask_bbox: (M, 4) int32 per-instance mask bounds
        (r_min, r_max, c_min, c_max), empty instances = (H, -1, W, -1) —
        precomputed host-side (the mask bbox is a static property of the
        record, so reducing it on device every epoch is wasted work)
      poses: (M, 3, 4); scales: (M, 3)
    Returns:
      (pcls (M, num_points, 3), idx (M, num_points) flat H*W pixel indices,
       n_inside (M,)) — same contract as `batch_ball_crop`.
    """
    h, w = depth.shape
    m = poses.shape[0]
    # per-dim clamp matches batch_ball_crop's windowed path
    wsh, wsw = min(int(window_size), h), min(int(window_size), w)
    keys = jax.random.split(key, m)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    bit_packed = packed.ndim == 2
    bits = jnp.arange(m, dtype=packed.dtype if bit_packed else jnp.uint8)

    def one_inst(k, bit, bbox, pose, scale, mask_i=None):
        r0, c0 = _window_origin(bbox[0], bbox[1], bbox[2], bbox[3],
                                wsh, wsw, h, w)
        dw = jax.lax.dynamic_slice(depth, (r0, c0), (wsh, wsw))
        if dw.dtype == jnp.uint16:
            # f32(u16)/1000 is exactly rounded — bit-identical to the host's
            # load_depth value (see _make_one_image_fn)
            dw = dw.astype(jnp.float32) / 1000.0
        if bit_packed:
            word_w = jax.lax.dynamic_slice(packed, (r0, c0), (wsh, wsw))
            mask_w = (jnp.right_shift(word_w, bit) & 1).astype(bool)
        else:
            mask_w = jax.lax.dynamic_slice(mask_i, (r0, c0), (wsh, wsw))
        # in-window backproject, same f32 op order as geom.transforms
        # .backproject ((pix - c) exact in f32, then * depth / f)
        vy = (r0 + jnp.arange(wsh))[:, None].astype(dw.dtype) - cy
        vx = (c0 + jnp.arange(wsw))[None, :].astype(dw.dtype) - cx
        pts = jnp.stack([vx * dw / fx, vy * dw / fy, dw], axis=-1)
        pts = pts.reshape(-1, 3)
        valid = mask_w.reshape(-1) & (pts[:, 2] > 0)
        sampled, idx_w, n_in = crop_ball_from_cloud(
            k, pts, valid, pose, scale, ratio, num_points,
            selection=selection)
        idx = _window_to_flat_idx(idx_w, r0, c0, wsw, w)
        return sampled, idx, n_in

    if bit_packed:
        return jax.vmap(one_inst)(keys, bits, mask_bbox, poses, scales)
    return jax.vmap(one_inst)(keys, bits, mask_bbox, poses, scales, packed)


def batch_ball_crop_candidates(depth: jnp.ndarray, K: jnp.ndarray,
                               packed: jnp.ndarray, mask_bbox: jnp.ndarray,
                               poses: jnp.ndarray, scales: jnp.ndarray,
                               ratio: float, window_size: int):
    """Deterministic half of `batch_ball_crop_from_depth`: per-instance
    window slice + backproject + in-ball mask, with the EXACT op order of
    the fused path (same slices, same f32 arithmetic, same
    `ball_inside_mask`). On the frozen-eval path every input here is a pure
    function of the record (test init estimates are fixed), so the result
    can be computed ONCE per record and cached in HBM; each eval pass then
    replays only the randomized `batch_select_from_candidates` — measured
    ~2/3 of the sampler's device time is this half (docs/PERF.md round-5
    sampler decomposition).

    Returns (pts (M, wsh*wsw, 3) f32, inside (M, wsh*wsw) bool,
    n_inside (M,) int32, origin (M, 2) int32 window origins).
    """
    h, w = depth.shape
    m = poses.shape[0]
    wsh, wsw = min(int(window_size), h), min(int(window_size), w)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    bit_packed = packed.ndim == 2
    bits = jnp.arange(m, dtype=packed.dtype if bit_packed else jnp.uint8)

    def one_inst(bit, bbox, pose, scale, mask_i=None):
        r0, c0 = _window_origin(bbox[0], bbox[1], bbox[2], bbox[3],
                                wsh, wsw, h, w)
        dw = jax.lax.dynamic_slice(depth, (r0, c0), (wsh, wsw))
        if dw.dtype == jnp.uint16:
            dw = dw.astype(jnp.float32) / 1000.0
        if bit_packed:
            word_w = jax.lax.dynamic_slice(packed, (r0, c0), (wsh, wsw))
            mask_w = (jnp.right_shift(word_w, bit) & 1).astype(bool)
        else:
            mask_w = jax.lax.dynamic_slice(mask_i, (r0, c0), (wsh, wsw))
        vy = (r0 + jnp.arange(wsh))[:, None].astype(dw.dtype) - cy
        vx = (c0 + jnp.arange(wsw))[None, :].astype(dw.dtype) - cx
        pts = jnp.stack([vx * dw / fx, vy * dw / fy, dw], axis=-1)
        pts = pts.reshape(-1, 3)
        valid = mask_w.reshape(-1) & (pts[:, 2] > 0)
        center = pose[:, 3]
        radius = ratio * jnp.linalg.norm(pose[:, :3] @ scale)
        inside, n_inside = ball_inside_mask(pts, valid, center, radius)
        return pts, inside, n_inside, jnp.stack([r0, c0])

    if bit_packed:
        return jax.vmap(one_inst)(bits, mask_bbox, poses, scales)
    return jax.vmap(one_inst)(bits, mask_bbox, poses, scales, packed)


def batch_select_from_candidates(key, pts: jnp.ndarray, inside: jnp.ndarray,
                                 n_inside: jnp.ndarray, origin: jnp.ndarray,
                                 num_points: int, img_w: int, wsw: int,
                                 selection: str = "topk"):
    """Randomized half over precomputed candidates: same per-image key split
    and per-instance priority draw as `batch_ball_crop_from_depth`, so
    composing `batch_ball_crop_candidates` + this is bit-identical to the
    fused path (pinned by tests/test_sampling.py).

    Args shapes: pts (M, n, 3), inside (M, n), n_inside (M,), origin (M, 2).
    Returns the `batch_ball_crop` contract: (pcls (M, num_points, 3),
    idx (M, num_points) flat H*W pixel indices, n_inside (M,)).
    """
    m = pts.shape[0]
    keys = jax.random.split(key, m)

    def one_inst(k, p, ins, n_in, org):
        idx_w = select_inside(k, ins, n_in, num_points, selection)
        idx = _window_to_flat_idx(idx_w, org[0], org[1], wsw, img_w)
        return gather_points_mxu(p, idx_w), idx, n_in

    return jax.vmap(one_inst)(keys, pts, inside, n_inside, origin)


def farthest_point_indices(pts: jnp.ndarray, num_points: int,
                           start_from_mean: bool = True,
                           valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Farthest point sampling over (M, 3) -> (num_points,) indices.

    Matches `core/utils/farthest_points_torch.py:6-62` (mean-init: the first
    selected point is the one farthest from the centroid).  With `valid`,
    invalid points are never selected (their distance is pinned to -inf).
    """
    m = pts.shape[0]
    neg = jnp.float32(-jnp.inf)
    if valid is not None:
        vmask = valid.astype(bool)
        n_valid = jnp.maximum(jnp.sum(vmask), 1)
        centroid = jnp.sum(jnp.where(vmask[:, None], pts, 0.0), axis=0) / n_valid
    else:
        vmask = None
        centroid = pts.mean(axis=0)

    if start_from_mean:
        d0 = jnp.linalg.norm(pts - centroid[None, :], axis=-1)
        if vmask is not None:
            d0 = jnp.where(vmask, d0, neg)
        first = jnp.argmax(d0).astype(jnp.int32)
    else:
        first = jnp.int32(0)

    def body(i, carry):
        idx, min_dist = carry
        last = pts[idx[i - 1]]
        d = jnp.linalg.norm(pts - last[None, :], axis=-1)
        min_dist = jnp.minimum(min_dist, d)
        cand = min_dist if vmask is None else jnp.where(vmask, min_dist, neg)
        idx = idx.at[i].set(jnp.argmax(cand).astype(jnp.int32))
        return idx, min_dist

    idx0 = jnp.zeros(num_points, jnp.int32).at[0].set(first)
    mind0 = jnp.full((m,), jnp.inf, dtype=pts.dtype)
    idx, _ = jax.lax.fori_loop(1, num_points, body, (idx0, mind0))
    return idx


def random_sample_indices(key, n_candidates: int, num_points: int,
                          n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Uniform sample without replacement (randperm[:k] semantics,
    `cat_data_utils.py:314-320`), cycling when n_valid < num_points."""
    priority = jax.random.uniform(key, (n_candidates,))
    if n_valid is not None:
        pos = jnp.arange(n_candidates)
        priority = jnp.where(pos < n_valid, priority, BIG)
    _, idx = jax.lax.top_k(-priority, num_points)
    idx = idx.astype(jnp.int32)
    if n_valid is not None:
        j = jnp.arange(num_points, dtype=jnp.int32)
        wrap = j % jnp.maximum(n_valid, 1)
        idx = jnp.where(j < n_valid, idx, idx[wrap])
    return idx
