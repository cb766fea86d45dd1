"""Fused rotation-head Pallas kernel.

The rot head (models/heads.py RotHead) is bandwidth-bound as separate XLA
ops: the (B, P+K, 256) activations flow through Dense->GN->GELU twice per
head and HBM round-trips dominate (~34ms/iter at B=1024 on v5e).  Per object
the whole computation fits in VMEM (point features 2048x64 = 256KB bf16,
activations 2048x256 f32 = 2MB), so this kernel runs BOTH per-axis heads for
one object per grid step, reading the point features from HBM exactly once
and writing just 6 floats:

  per head: x = pf @ W_pt + [g_pcl|g_kps] @ W_g + b0
            GN(32) -> GELU -> @ W1 + b1 -> GN(32) -> GELU
            out = (pw @ x) @ W_neck + sum(pw)*b_neck + b_p   (conv_p folded)

Used on the inference path (`CATREConfig.fused_heads`); training keeps the
unfused flax modules (autodiff).  Numerics: f32 activations inside the
kernel, erf GELU, GroupNorm eps 1e-5 — matches the flax path to ~1e-5.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (abs err ~1.5e-7): Pallas TPU
    has no erf lowering; this keeps the kernel within bf16 noise of the
    exact-GELU flax path."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return sign * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_approx(x * np.float32(1.0 / np.sqrt(2.0))))


def _group_onehot(C, num_groups):
    """(C, G) one-hot channel->group matrix built from iota (reshape-free:
    Mosaic rejects lane-splitting shape casts)."""
    cg = C // num_groups
    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    return (cidx // cg == gidx).astype(jnp.float32)


def _group_norm_rows(x, scale, bias, num_groups=32, eps=1e-5):
    """GN over a (P, C) block: stats per group of C//G channels across all P
    rows; group aggregation/broadcast via one-hot matmuls (MXU)."""
    P, C = x.shape
    cg = C // num_groups
    M = _group_onehot(C, num_groups)             # (C, G)
    s1 = jnp.sum(x, axis=0, keepdims=True)       # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)   # (1, C)
    g1 = jnp.dot(s1, M, preferred_element_type=jnp.float32)  # (1, G)
    g2 = jnp.dot(s2, M, preferred_element_type=jnp.float32)
    n = P * cg
    mean_g = g1 / n
    var_g = g2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # back to channel vectors: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)
    return (x - mean_c) * inv_c * scale + bias


def _head_body(cdt, pf, g_sel, w_pt, b0, gn0_s, gn0_b, w1, b1, gn1_s, gn1_b,
               neck_w, neck_b, pw, pb):
    """One per-axis head for one object. pf: (P, 64); g_sel: (P, 256) f32
    precomputed global term. 1-D params arrive reshaped to (1, -1).
    Matmuls run in `cdt` (bf16 on TPU) with f32 accumulation; GN/GELU f32."""
    x = jnp.dot(pf.astype(cdt), w_pt.astype(cdt),
                preferred_element_type=jnp.float32) + g_sel + b0
    x = _gelu_exact(_group_norm_rows(x, gn0_s, gn0_b))
    x = jnp.dot(x.astype(cdt), w1.astype(cdt),
                preferred_element_type=jnp.float32) + b1
    x = _gelu_exact(_group_norm_rows(x, gn1_s, gn1_b))
    v = jnp.dot(pw, x, preferred_element_type=jnp.float32)  # (1, 256) f32
    out = v @ neck_w + jnp.sum(pw) * neck_b + pb  # (1, 3)
    return out


def _kernel(cdt, n_pcl_ref, pf_ref, gterm_x_ref, gterm_y_ref, *refs):
    """Grid step = one object. refs: 12 params for head x (w_g excluded —
    its term is precomputed), 12 for head y, then out_ref (1, 6)."""
    px = refs[:12]
    py = refs[12:24]
    out_ref = refs[24]
    n_pcl = n_pcl_ref[0]

    pf = pf_ref[0]  # (P, 64)
    P = pf.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    is_pcl = row < n_pcl  # (P, 1)

    def run(gterm_ref, params):
        gt = gterm_ref[0].astype(jnp.float32)  # (2, 256): [pcl term, kps term]
        g_sel = jnp.where(is_pcl, gt[0][None, :], gt[1][None, :])
        return _head_body(cdt, pf, g_sel, *[p[...] for p in params])

    rx = run(gterm_x_ref, px)  # (1, 3)
    ry = run(gterm_y_ref, py)
    # out block is (1, 8, 128) to satisfy TPU tiling; row 0 cols 0:6 are real.
    # Built by concatenation (no scatter lowering on TPU).
    row = jnp.concatenate([rx, ry, jnp.zeros((1, 122), jnp.float32)], axis=1)
    out_ref[0] = jnp.concatenate([row, jnp.zeros((7, 128), jnp.float32)], axis=0)


def _head_param_list(hp: dict):
    """Flatten one RotHead param subtree into the kernel argument order."""
    return [
        hp["layer0_kernel"][:1024],       # w_g (1024, 256)
        hp["layer0_kernel"][1024:],       # w_pt (64, 256)
        hp["layer0_bias"],
        hp["gn0"]["scale"], hp["gn0"]["bias"],
        hp["layer1"]["Dense_0"]["kernel"], hp["layer1"]["Dense_0"]["bias"],
        hp["gn1"]["scale"], hp["gn1"]["bias"],
        hp["neck"]["Dense_0"]["kernel"], hp["neck"]["Dense_0"]["bias"],
        hp["point_weight"],
        hp["point_bias_param"],
    ]


@partial(jax.jit, static_argnames=("n_pcl", "interpret", "compute_dtype"))
def fused_conv_per_rot_head(point_feats: jnp.ndarray, g_pcl: jnp.ndarray,
                            g_kps: jnp.ndarray, rot_head_params: dict,
                            n_pcl: int, interpret: bool = False,
                            compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused ConvOutPerRotHead forward.

    Args:
      point_feats: (B, P+K, 64)
      g_pcl, g_kps: (B, 1024) per-cloud globals
      rot_head_params: {'rot_head_x': {...}, 'rot_head_y': {...}} flax params
      n_pcl: static pcl point count (split position)
    Returns:
      (B, 6) rotation deltas [rx | ry]
    """
    B, P, _ = point_feats.shape

    def prep(p):
        p = p.astype(jnp.float32)
        return p.reshape(1, -1) if p.ndim <= 1 else p  # 2-D for Mosaic

    px = [prep(p) for p in _head_param_list(rot_head_params["rot_head_x"])]
    py = [prep(p) for p in _head_param_list(rot_head_params["rot_head_y"])]

    # the global-feature terms are per-object (B, 2, 256) — computed OUTSIDE
    # the kernel as two big batched matmuls (MXU-efficient)
    def gterms(p):
        w_g, b0 = p[0], None
        t_pcl = g_pcl.astype(jnp.float32) @ w_g  # (B, 256)
        t_kps = g_kps.astype(jnp.float32) @ w_g
        return jnp.stack([t_pcl, t_kps], axis=1)  # (B, 2, 256)

    gx = gterms(px)
    gy = gterms(py)

    n_pcl_arr = jnp.full((1,), n_pcl, dtype=jnp.int32)

    feat_dim = px[2].shape[-1]  # b0 is (1, 256) after prep
    param_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in px[1:] + py[1:]
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, point_feats.shape[2]), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, feat_dim), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, feat_dim), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs,
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    cdt = jnp.float32 if interpret else compute_dtype
    out = pl.pallas_call(
        partial(_kernel, cdt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        interpret=interpret,
    )(n_pcl_arr, point_feats, gx, gy, *px[1:], *py[1:])
    return out[:, 0, :6]
