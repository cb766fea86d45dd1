"""Multi-object-blocked variant of the fused rotation-head kernel.

The per-object kernel in pallas_heads.py runs a (B,) grid with small per-step
matmuls; this variant processes G objects per grid step with ALL matmuls
batched over the G*(P+K) rows — group statistics, the per-object global-term
add and the conv_p point reduction are expressed as one-hot segment matmuls
so nothing leaves the MXU/VPU.  Reshape-free (Mosaic rejects lane-splitting
shape casts): blocks are assembled by static concatenation.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_heads import _gelu_fast, _group_norm_rows, _group_onehot, _head_param_list


def _blocked_kernel(cdt, G, P, n_pcl, *refs):
    """refs: pf, gx, gy, 12 params x, 12 params y, out."""
    pf_ref, gx_ref, gy_ref = refs[0], refs[1], refs[2]
    px = refs[3:15]
    py = refs[15:27]
    out_ref = refs[27]

    # flatten G objects: leading-dims collapse (sublane-contiguous, no lane
    # change — supported by Mosaic, unlike lane-splitting casts)
    pf = pf_ref[...].reshape(G * P, pf_ref.shape[2])

    # pcl/kps row mask (G*P, 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (G * P, 1), 0)
    is_pcl = (r % P) < n_pcl  # (G*P, 1)

    def run(gterm_ref, params):
        (w_pt, b0, gn0_s, gn0_b, w1, b1, gn1_s, gn1_b,
         neck_w, neck_b, pw, pb) = [p[...] for p in params]
        gt = gterm_ref[...]  # (G, 2, C)

        # big flattened matmuls (MXU fill); per-object work via STATIC slices
        # (cheap VPU reductions — no segment matmuls, which measured slower)
        x = jnp.dot(pf.astype(cdt), w_pt.astype(cdt),
                    preferred_element_type=jnp.float32)
        # per-object global-term add (rows within an object share the term)
        gpcl = jnp.concatenate(
            [jnp.broadcast_to(gt[c, 0][None, :], (P, gt.shape[2])) for c in range(G)], axis=0)
        gkps = jnp.concatenate(
            [jnp.broadcast_to(gt[c, 1][None, :], (P, gt.shape[2])) for c in range(G)], axis=0)
        x = x + jnp.where(is_pcl, gpcl, gkps) + b0

        def gn_per_obj(x, scale, bias):
            pieces = []
            for c in range(G):
                pieces.append(_group_norm_rows(x[c * P:(c + 1) * P], scale, bias))
            return jnp.concatenate(pieces, axis=0)

        x = _gelu_fast(gn_per_obj(x, gn0_s, gn0_b)).astype(cdt)
        x = jnp.dot(x, w1.astype(cdt), preferred_element_type=jnp.float32) + b1
        x = _gelu_fast(gn_per_obj(x, gn1_s, gn1_b)).astype(cdt)
        # conv_p per object: static-slice point reductions
        vs = [jnp.dot(pw.astype(cdt), x[c * P:(c + 1) * P],
                      preferred_element_type=jnp.float32) for c in range(G)]
        v = jnp.concatenate(vs, axis=0)  # (G, C)
        return v @ neck_w + jnp.sum(pw) * neck_b + pb  # (G, 3)

    rx = run(gx_ref, px)  # (G, 3)
    ry = run(gy_ref, py)
    # out block is (1, G*8, 128): object i's result in row 8*i, cols 0:6 —
    # assembled by one axis-0 concat of (1,128)/(7,128) pieces
    pad = jnp.zeros((G, 122), jnp.float32)
    rows6 = jnp.concatenate([rx, ry, pad], axis=1)  # (G, 128)
    zeros7 = jnp.zeros((7, 128), jnp.float32)
    pieces = []
    for i in range(G):
        pieces.append(rows6[i : i + 1])
        pieces.append(zeros7)
    out_ref[0] = jnp.concatenate(pieces, axis=0)  # (G*8, 128)


def _gn_segmented(x, obj_oh, scale, bias, P, cdt=jnp.float32, num_groups=32, eps=1e-5):
    """GroupNorm with per-object statistics on flattened (G*P, C) rows:
    object aggregation via the row one-hot, channel-group aggregation via the
    channel one-hot — all matmuls. Statistics accumulate in f32; the
    (G*P, C) row buffers stay in `cdt`."""
    C = x.shape[1]
    cg = C // num_groups
    M = _group_onehot(C, num_groups)  # (C, G_ch)
    oh = obj_oh.astype(cdt)
    # per-object channel sums: (G, C) — f32 accumulation
    s1 = jnp.dot(oh.T, x, preferred_element_type=jnp.float32)
    s2 = jnp.dot(oh.T, x.astype(jnp.float32) * x.astype(jnp.float32) if cdt == jnp.float32
                 else (x * x), preferred_element_type=jnp.float32)
    g1 = jnp.dot(s1, M, preferred_element_type=jnp.float32)  # (G, G_ch)
    g2 = jnp.dot(s2, M, preferred_element_type=jnp.float32)
    n = P * cg
    mean_g = g1 / n
    var_g = g2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)  # (G, C)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)
    mean_rows = jnp.dot(oh, mean_c.astype(cdt), preferred_element_type=jnp.float32).astype(cdt)
    inv_rows = jnp.dot(oh, inv_c.astype(cdt), preferred_element_type=jnp.float32).astype(cdt)
    return ((x - mean_rows) * inv_rows * scale.astype(cdt) + bias.astype(cdt))


@partial(jax.jit, static_argnames=("n_pcl", "block_size", "interpret", "compute_dtype"))
def fused_conv_per_rot_head_blocked(point_feats: jnp.ndarray, g_pcl: jnp.ndarray,
                                    g_kps: jnp.ndarray, rot_head_params: dict,
                                    n_pcl: int, block_size: int = 8,
                                    interpret: bool = False,
                                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Blocked fused ConvOutPerRotHead: G objects per grid step."""
    B, P, _ = point_feats.shape
    G = block_size
    assert B % G == 0, (B, G)

    def prep(p):
        p = p.astype(jnp.float32)
        return p.reshape(1, -1) if p.ndim <= 1 else p

    px = [prep(p) for p in _head_param_list(rot_head_params["rot_head_x"])]
    py = [prep(p) for p in _head_param_list(rot_head_params["rot_head_y"])]

    def gterms(p):
        w_g = p[0]
        return jnp.stack([g_pcl.astype(jnp.float32) @ w_g,
                          g_kps.astype(jnp.float32) @ w_g], axis=1)  # (B, 2, 256)

    gx = gterms(px)
    gy = gterms(py)
    feat_dim = px[2].shape[-1]

    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in px[1:] + py[1:]]
    cdt = jnp.float32 if interpret else compute_dtype

    out = pl.pallas_call(
        partial(_blocked_kernel, cdt, G, P, n_pcl),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, P, point_feats.shape[2]), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 2, feat_dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 2, feat_dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs,
        out_specs=pl.BlockSpec((1, G * 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // G, G * 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(point_feats, gx, gy, *px[1:], *py[1:])
    return out.reshape(B, 8, 128)[:, 0, :6]
