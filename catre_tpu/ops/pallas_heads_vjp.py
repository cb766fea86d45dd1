"""Custom-VJP fused rotation head: Pallas forward AND backward.

The unfused rot head dominates the training step's HBM traffic the same way
it does inference's (fwd + bwd each stream (B, P+K, 256) activations).  Here
the backward recomputes the forward entirely in VMEM per object (residuals =
just the inputs) and emits input gradients plus PER-OBJECT parameter
gradients; the cross-object parameter-grad reduction and the W_g/g grads are
cheap XLA contractions outside the kernel.

Validated against jax.grad of the flax ConvOutPerRotHead in interpreter mode
(tests/test_pallas_vjp.py). Enable with CATREConfig.fused_heads on the
training path via `fused_rot_head_train`.

Math (per head, per object; P rows = P_pcl + K_kps, C = feat_dim):
  x0 = pf @ W_pt + g_sel + b0
  x1 = gelu(GN0(x0));  x2 = x1 @ W1 + b1;  x3 = gelu(GN1(x2))
  v  = pw @ x3;  out = v @ Wn + sum(pw) * bn + pb
GN backward (per group, n = P * C/G elements, y = (x - mu) * inv):
  dx = inv * (dy - mean(dy) - y * mean(dy * y))    [means over the group]
GELU' = Phi(x) + x * phi(x).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_heads import (
    _erf_approx,
    _group_onehot,
    _head_param_list,
)

_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))
_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf_approx(x * _INV_SQRT2))


def _gelu_grad(x):
    phi = jnp.exp(-0.5 * x * x) * _INV_SQRT2PI
    Phi = 0.5 * (1.0 + _erf_approx(x * _INV_SQRT2))
    return Phi + x * phi


def _gn_fwd(x, scale, bias, M, n):
    """Returns (out, y, inv_c) with y = normalized pre-affine, inv_c (1, C)."""
    s1 = jnp.sum(x, axis=0, keepdims=True)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    g1 = jnp.dot(s1, M, preferred_element_type=jnp.float32)
    g2 = jnp.dot(s2, M, preferred_element_type=jnp.float32)
    mean_g = g1 / n
    var_g = g2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + 1e-5)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c
    return y * scale + bias, y, inv_c


def _gn_bwd(d_out, y, inv_c, scale, M, n):
    """Returns (d_x, d_scale (1,C), d_bias (1,C))."""
    d_scale = jnp.sum(d_out * y, axis=0, keepdims=True)
    d_bias = jnp.sum(d_out, axis=0, keepdims=True)
    dy = d_out * scale
    # group means of dy and dy*y
    m1 = jnp.dot(jnp.dot(jnp.sum(dy, axis=0, keepdims=True), M,
                         preferred_element_type=jnp.float32) / n, M.T,
                 preferred_element_type=jnp.float32)
    m2 = jnp.dot(jnp.dot(jnp.sum(dy * y, axis=0, keepdims=True), M,
                         preferred_element_type=jnp.float32) / n, M.T,
                 preferred_element_type=jnp.float32)
    d_x = inv_c * (dy - m1 - y * m2)
    return d_x, d_scale, d_bias


def _head_fwd_bwd(pf, g_sel, d_out, params, M, P, C):
    """Forward recompute + backward for one head on one object.

    Returns dict of grads: d_pf contribution, d_gsel (P, C) and per-param.
    """
    (w_pt, b0, gn0_s, gn0_b, w1, b1, gn1_s, gn1_b, neck_w, neck_b, pw, pb) = params
    n = P * (C // 32)

    x0 = jnp.dot(pf, w_pt, preferred_element_type=jnp.float32) + g_sel + b0
    h0, y0, inv0 = _gn_fwd(x0, gn0_s, gn0_b, M, n)
    x1 = _gelu(h0)
    x2 = jnp.dot(x1, w1, preferred_element_type=jnp.float32) + b1
    h1, y1, inv1 = _gn_fwd(x2, gn1_s, gn1_b, M, n)
    x3 = _gelu(h1)
    v = jnp.dot(pw, x3, preferred_element_type=jnp.float32)  # (1, C)

    # out = v @ neck_w + sum(pw)*neck_b + pb ; d_out: (1, 3)
    d_neck_w = jnp.dot(v.T, d_out, preferred_element_type=jnp.float32)  # (C, 3)
    d_neck_b = jnp.sum(pw) * d_out
    d_pb = d_out
    d_v = jnp.dot(d_out, neck_w.T, preferred_element_type=jnp.float32)  # (1, C)
    d_x3 = jnp.dot(pw.T, d_v, preferred_element_type=jnp.float32)  # (P, C)
    d_pw = (jnp.dot(x3, d_v.T, preferred_element_type=jnp.float32).T
            + jnp.dot(d_out, neck_b.T, preferred_element_type=jnp.float32))  # (1, P)+(1,1)

    d_h1 = d_x3 * _gelu_grad(h1)
    d_x2, d_gn1_s, d_gn1_b = _gn_bwd(d_h1, y1, inv1, gn1_s, M, n)
    d_w1 = jnp.dot(x1.T, d_x2, preferred_element_type=jnp.float32)
    d_b1 = jnp.sum(d_x2, axis=0, keepdims=True)
    d_x1 = jnp.dot(d_x2, w1.T, preferred_element_type=jnp.float32)

    d_h0 = d_x1 * _gelu_grad(h0)
    d_x0, d_gn0_s, d_gn0_b = _gn_bwd(d_h0, y0, inv0, gn0_s, M, n)
    d_w_pt = jnp.dot(pf.T, d_x0, preferred_element_type=jnp.float32)
    d_b0 = jnp.sum(d_x0, axis=0, keepdims=True)
    d_pf = jnp.dot(d_x0, w_pt.T, preferred_element_type=jnp.float32)
    d_gsel = d_x0

    return d_pf, d_gsel, [d_w_pt, d_b0, d_gn0_s, d_gn0_b, d_w1, d_b1,
                          d_gn1_s, d_gn1_b, d_neck_w, d_neck_b, d_pw, d_pb]


def _bwd_kernel(C, n_pcl_ref, pf_ref, gx_ref, gy_ref, dout_ref, *refs):
    """Grid step = one object. refs: 12 params x, 12 params y, then outputs:
    d_pf (1,P,64), d_gx (1,2,C), d_gy (1,2,C), 12 per-object param grads for
    x (padded 2-D), 12 for y."""
    px = refs[:12]
    py = refs[12:24]
    out_refs = refs[24:]
    d_pf_ref, d_gx_ref, d_gy_ref = out_refs[0], out_refs[1], out_refs[2]
    gpx_refs = out_refs[3:15]
    gpy_refs = out_refs[15:27]

    n_pcl = n_pcl_ref[0]
    pf = pf_ref[0].astype(jnp.float32)  # (P, 64)
    P = pf.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    is_pcl = row < n_pcl
    M = _group_onehot(C, 32)
    d_out = dout_ref[0].astype(jnp.float32)  # block (1, 1, 6) -> (1, 6)

    def run(g_ref, params, d_o):
        gt = g_ref[0].astype(jnp.float32)  # (2, C)
        g_sel = jnp.where(is_pcl, gt[0][None, :], gt[1][None, :])
        return _head_fwd_bwd(pf, g_sel, d_o, [p[...] for p in params], M, P, C)

    d_pf_x, d_gsel_x, gx_grads = run(gx_ref, px, d_out[:, 0:3])
    d_pf_y, d_gsel_y, gy_grads = run(gy_ref, py, d_out[:, 3:6])

    d_pf_ref[0] = d_pf_x + d_pf_y

    def gsel_split(d_gsel):
        d_pcl = jnp.sum(jnp.where(is_pcl, d_gsel, 0.0), axis=0, keepdims=True)
        d_kps = jnp.sum(jnp.where(is_pcl, 0.0, d_gsel), axis=0, keepdims=True)
        return jnp.concatenate([d_pcl, d_kps], axis=0)  # (2, C)

    d_gx_ref[0] = gsel_split(d_gsel_x)
    d_gy_ref[0] = gsel_split(d_gsel_y)

    for ref, g in zip(gpx_refs, gx_grads):
        ref[0] = g
    for ref, g in zip(gpy_refs, gy_grads):
        ref[0] = g


def _run_bwd(point_feats, gx, gy, d_out6, px, py, n_pcl, interpret):
    B, P, cin = point_feats.shape
    C = px[2].shape[-1]

    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in px[1:] + py[1:]]

    def per_obj(spec_shape):
        return pl.BlockSpec((1,) + spec_shape, lambda b, *_: (b,) + (0,) * len(spec_shape),
                            memory_space=pltpu.VMEM)

    # per-object parameter-grad output shapes (2-D padded where needed)
    pshapes = [
        (cin, C), (1, C), (1, C), (1, C), (C, C), (1, C), (1, C), (1, C),
        (C, 3), (1, 3), (1, P), (1, 3),
    ]
    out_shapes = ([jax.ShapeDtypeStruct((B, P, cin), jnp.float32),
                   jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, 2, C), jnp.float32)]
                  + [jax.ShapeDtypeStruct((B,) + s, jnp.float32) for s in pshapes] * 2)
    out_specs = ([per_obj((P, cin)), per_obj((2, C)), per_obj((2, C))]
                 + [per_obj(s) for s in pshapes] * 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, cin), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            # (B, 1, 6) so the block equals the trailing array dims
            pl.BlockSpec((1, 1, 6), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs,
        out_specs=tuple(out_specs),
    )

    n_pcl_arr = jnp.full((1,), n_pcl, dtype=jnp.int32)
    return pl.pallas_call(
        partial(_bwd_kernel, C),
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(n_pcl_arr, point_feats, gx, gy, d_out6.reshape(-1, 1, 6), *px[1:], *py[1:])


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_rot_head_train(point_feats, g_pcl, g_kps, rot_head_params,
                         n_pcl: int, interpret: bool = False):
    """Differentiable fused ConvOutPerRotHead (training path)."""
    from .pallas_heads import fused_conv_per_rot_head

    return fused_conv_per_rot_head(
        point_feats, g_pcl, g_kps, rot_head_params, n_pcl=n_pcl,
        interpret=interpret, compute_dtype=jnp.float32,
    )


def _fwd(point_feats, g_pcl, g_kps, rot_head_params, n_pcl, interpret):
    out = fused_rot_head_train(point_feats, g_pcl, g_kps, rot_head_params,
                               n_pcl, interpret)
    return out, (point_feats, g_pcl, g_kps, rot_head_params)


def _bwd(n_pcl, interpret, res, d_out):
    point_feats, g_pcl, g_kps, rot_head_params = res

    def prep(p):
        p = p.astype(jnp.float32)
        return p.reshape(1, -1) if p.ndim <= 1 else p

    px = [prep(p) for p in _head_param_list(rot_head_params["rot_head_x"])]
    py = [prep(p) for p in _head_param_list(rot_head_params["rot_head_y"])]

    gx = jnp.stack([g_pcl.astype(jnp.float32) @ px[0],
                    g_kps.astype(jnp.float32) @ px[0]], axis=1)
    gy = jnp.stack([g_pcl.astype(jnp.float32) @ py[0],
                    g_kps.astype(jnp.float32) @ py[0]], axis=1)

    outs = _run_bwd(point_feats.astype(jnp.float32), gx, gy,
                    d_out.astype(jnp.float32), px, py, n_pcl, interpret)
    d_pf, d_gx, d_gy = outs[0], outs[1], outs[2]
    gpx = outs[3:15]
    gpy = outs[15:27]

    # input grads through the precomputed global terms: gx = g @ W_g
    d_g_pcl = d_gx[:, 0, :] @ px[0].T + d_gy[:, 0, :] @ py[0].T
    d_g_kps = d_gx[:, 1, :] @ px[0].T + d_gy[:, 1, :] @ py[0].T
    d_wg_x = g_pcl.astype(jnp.float32).T @ d_gx[:, 0, :] + \
        g_kps.astype(jnp.float32).T @ d_gx[:, 1, :]
    d_wg_y = g_pcl.astype(jnp.float32).T @ d_gy[:, 0, :] + \
        g_kps.astype(jnp.float32).T @ d_gy[:, 1, :]

    def head_grads(g_per_obj, d_wg):
        s = [jnp.sum(g, axis=0) for g in g_per_obj]  # reduce over objects
        (d_w_pt, d_b0, d_gn0_s, d_gn0_b, d_w1, d_b1, d_gn1_s, d_gn1_b,
         d_neck_w, d_neck_b, d_pw, d_pb) = s
        return {
            "layer0_kernel": jnp.concatenate([d_wg, d_w_pt], axis=0),
            "layer0_bias": d_b0[0],
            "gn0": {"scale": d_gn0_s[0], "bias": d_gn0_b[0]},
            "layer1": {"Dense_0": {"kernel": d_w1, "bias": d_b1[0]}},
            "gn1": {"scale": d_gn1_s[0], "bias": d_gn1_b[0]},
            "neck": {"Dense_0": {"kernel": d_neck_w, "bias": d_neck_b[0]}},
            "point_weight": d_pw[0],
            "point_bias_param": jnp.sum(d_pb[0])[None],
        }

    d_params = {
        "rot_head_x": head_grads(gpx, d_wg_x),
        "rot_head_y": head_grads(gpy, d_wg_y),
    }
    return (d_pf.astype(point_feats.dtype), d_g_pcl.astype(g_pcl.dtype),
            d_g_kps.astype(g_kps.dtype), d_params)


fused_rot_head_train.defvjp(_fwd, _bwd)
