"""Custom-VJP fused rotation head: Pallas forward AND backward.

The unfused rot head dominates the training step's HBM traffic the same way
it does inference's (fwd + bwd each stream (B, P+K, 256) activations).  Here
the backward recomputes the forward entirely in VMEM per object (residuals =
just the inputs) and emits input gradients plus PER-OBJECT parameter
gradients; the cross-object parameter-grad reduction and the W_g/g grads are
cheap XLA contractions outside the kernel.

VMEM discipline (the stack limit is 16MB): each kernel call handles ONE head;
the big (P, C) buffers are kept in the compute dtype (bf16 on TPU, f32 in
interpreter mode); normalized GN tensors are never stored — they are
recomputed from the kept pre-GN activations plus the tiny per-group stats.

Validated against jax.grad of the flax ConvOutPerRotHead in interpreter mode
(tests/test_pallas_vjp.py). Enable with CATREConfig.fused_heads_train.

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

from .pallas_heads import _gelu_exact, _group_onehot, _head_param_list, _norm_cdf

_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _gelu(x):
    return _gelu_exact(x)


def _gelu_grad(x):
    # pdf via hardware exp (~1e-7 rel; a deg-18 polynomial's ~1e-6 abs error
    # fails the x50-scaled gradient-parity stress test); the cdf is the
    # FMA-only polynomial from pallas_heads — the erf+divide it replaces was
    # the expensive part.
    phi = jnp.exp(-0.5 * x * x) * _INV_SQRT2PI
    return _norm_cdf(x) + x * phi


def _gn_stats(x, M, n):
    """(mean_c (1,C), inv_c (1,C)) of GN over a (P, C) block (f32)."""
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=0, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
    g1 = jnp.dot(s1, M, preferred_element_type=jnp.float32)
    g2 = jnp.dot(s2, M, preferred_element_type=jnp.float32)
    mean_g = g1 / n
    var_g = g2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + 1e-5)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32)
    return mean_c, inv_c


def _gn_bwd_from_stats(d_out, x, mean_c, inv_c, scale, M, n, cdt):
    """GN backward recomputing y from (x, stats). All (P, C) tensors live in
    `cdt` (bf16 on TPU) to stay inside the VMEM stack budget; the per-group
    reductions accumulate in f32. Returns (d_x (P,C) cdt, d_scale, d_bias)."""
    y = ((x.astype(jnp.float32) - mean_c) * inv_c).astype(cdt)
    d_scale = jnp.sum(d_out.astype(jnp.float32) * y.astype(jnp.float32),
                      axis=0, keepdims=True)
    d_bias = jnp.sum(d_out.astype(jnp.float32), axis=0, keepdims=True)
    dy = (d_out.astype(jnp.float32) * scale).astype(cdt)
    m1 = jnp.dot(jnp.dot(jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True), M,
                         preferred_element_type=jnp.float32) / n, M.T,
                 preferred_element_type=jnp.float32)
    m2 = jnp.dot(jnp.dot(jnp.sum(dy.astype(jnp.float32) * y.astype(jnp.float32),
                                 axis=0, keepdims=True), M,
                         preferred_element_type=jnp.float32) / n, M.T,
                 preferred_element_type=jnp.float32)
    d_x = ((dy.astype(jnp.float32) - m1 - y.astype(jnp.float32) * m2)
           * inv_c).astype(cdt)
    return d_x, d_scale, d_bias


def _bwd_kernel(C, cdt, n_pcl_ref, pf_ref, g_ref, dout_ref, *refs):
    """Grid step = one object, ONE head. refs: 12 params, then outputs:
    d_pf (1,P,cin), d_g (1,2,C), 12 per-object param grads."""
    params = refs[:12]
    out_refs = refs[12:]
    d_pf_ref, d_g_ref = out_refs[0], out_refs[1]
    gp_refs = out_refs[2:14]

    (w_pt, b0, gn0_s, gn0_b, w1, b1, gn1_s, gn1_b,
     neck_w, neck_b, pw, pb) = [p[...] for p in params]

    n_pcl = n_pcl_ref[0]
    pf = pf_ref[0].astype(cdt)  # (P, cin)
    P = pf.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    is_pcl = row < n_pcl
    M = _group_onehot(C, 32)
    n = P * (C // 32)
    d_out = dout_ref[0].astype(jnp.float32)  # (1, 3)

    gt = g_ref[0].astype(jnp.float32)  # (2, C)
    g_sel = jnp.where(is_pcl, gt[0][None, :], gt[1][None, :])

    # ---- forward recompute, keeping only x0, x2 (cdt) + tiny stats
    x0 = (jnp.dot(pf, w_pt.astype(cdt), preferred_element_type=jnp.float32)
          + g_sel + b0).astype(cdt)
    mean0, inv0 = _gn_stats(x0, M, n)

    def h0_of(x0_):
        y0 = (x0_.astype(jnp.float32) - mean0) * inv0
        return y0 * gn0_s + gn0_b

    x1 = _gelu(h0_of(x0)).astype(cdt)
    x2 = (jnp.dot(x1, w1.astype(cdt), preferred_element_type=jnp.float32)
          + b1).astype(cdt)
    mean1, inv1 = _gn_stats(x2, M, n)

    def h1_of(x2_):
        y1 = (x2_.astype(jnp.float32) - mean1) * inv1
        return y1 * gn1_s + gn1_b

    h1 = h1_of(x2)
    x3 = _gelu(h1).astype(cdt)
    v = jnp.dot(pw.astype(cdt), x3, preferred_element_type=jnp.float32)  # (1, C)

    # ---- backward
    d_neck_w = jnp.dot(v.T, d_out, preferred_element_type=jnp.float32)
    d_neck_b = jnp.sum(pw) * d_out
    d_pb = d_out
    d_v = jnp.dot(d_out, neck_w.T, preferred_element_type=jnp.float32)  # (1, C)
    d_x3 = jnp.dot(pw.T.astype(cdt), d_v.astype(cdt),
                   preferred_element_type=jnp.float32)  # (P, C)
    d_pw = (jnp.dot(x3, d_v.T.astype(cdt), preferred_element_type=jnp.float32).T
            + jnp.dot(d_out, neck_b.T, preferred_element_type=jnp.float32))  # (1,P)+(1,1)

    d_h1 = d_x3 * _gelu_grad(h1)
    d_x2, d_gn1_s, d_gn1_b = _gn_bwd_from_stats(d_h1, x2, mean1, inv1, gn1_s, M, n, cdt)
    d_w1 = jnp.dot(x1.T, d_x2, preferred_element_type=jnp.float32)
    d_b1 = jnp.sum(d_x2.astype(jnp.float32), axis=0, keepdims=True)
    d_x1 = jnp.dot(d_x2, w1.T.astype(cdt), preferred_element_type=jnp.float32)

    d_h0 = d_x1 * _gelu_grad(h0_of(x0))
    d_x0, d_gn0_s, d_gn0_b = _gn_bwd_from_stats(d_h0, x0, mean0, inv0, gn0_s, M, n, cdt)
    d_w_pt = jnp.dot(pf.T, d_x0, preferred_element_type=jnp.float32)
    d_b0 = jnp.sum(d_x0.astype(jnp.float32), axis=0, keepdims=True)
    d_pf = jnp.dot(d_x0, w_pt.T.astype(cdt), preferred_element_type=jnp.float32)
    d_x0f = d_x0.astype(jnp.float32)
    d_g_pcl = jnp.sum(jnp.where(is_pcl, d_x0f, 0.0), axis=0, keepdims=True)
    d_g_kps = jnp.sum(jnp.where(is_pcl, 0.0, d_x0f), axis=0, keepdims=True)

    d_pf_ref[0] = d_pf.astype(jnp.float32)
    d_g_ref[0] = jnp.concatenate([d_g_pcl, d_g_kps], axis=0)
    grads = [d_w_pt, d_b0, d_gn0_s, d_gn0_b, d_w1, d_b1, d_gn1_s, d_gn1_b,
             d_neck_w, d_neck_b, d_pw, d_pb]
    for ref, g in zip(gp_refs, grads):
        ref[0] = g


def _run_bwd_one_head(point_feats, gterm, d_out3, p, n_pcl, interpret):
    B, P, cin = point_feats.shape
    C = p[2].shape[-1]
    cdt = jnp.float32 if interpret else jnp.bfloat16

    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in p[1:]]

    def per_obj(shape):
        return pl.BlockSpec((1,) + shape, lambda b, *_: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    pshapes = [
        (cin, C), (1, C), (1, C), (1, C), (C, C), (1, C), (1, C), (1, C),
        (C, 3), (1, 3), (1, P), (1, 3),
    ]
    out_shapes = ([jax.ShapeDtypeStruct((B, P, cin), jnp.float32),
                   jax.ShapeDtypeStruct((B, 2, C), jnp.float32)]
                  + [jax.ShapeDtypeStruct((B,) + s, jnp.float32) for s in pshapes])
    out_specs = ([per_obj((P, cin)), per_obj((2, C))] + [per_obj(s) for s in pshapes])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, cin), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs,
        out_specs=tuple(out_specs),
    )

    n_pcl_arr = jnp.full((1,), n_pcl, dtype=jnp.int32)
    return pl.pallas_call(
        partial(_bwd_kernel, C, cdt),
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        # the recompute backward needs ~21MB of stack; v5e VMEM is 128MB —
        # raise the scoped limit above the 16MB default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(n_pcl_arr, point_feats, gterm, d_out3.reshape(-1, 1, 3), *p[1:])


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_rot_head_train(point_feats, g_pcl, g_kps, rot_head_params,
                         n_pcl: int, interpret: bool = False):
    """Differentiable fused ConvOutPerRotHead (training path)."""
    from .pallas_heads import fused_conv_per_rot_head

    return fused_conv_per_rot_head(
        point_feats, g_pcl, g_kps, rot_head_params, n_pcl=n_pcl,
        interpret=interpret,
        compute_dtype=jnp.float32 if interpret else jnp.bfloat16,
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

    pf32 = point_feats.astype(jnp.float32)
    g_pcl32 = g_pcl.astype(jnp.float32)
    g_kps32 = g_kps.astype(jnp.float32)
    d32 = d_out.astype(jnp.float32)

    results = {}
    for name, p, sl in [("x", px, slice(0, 3)), ("y", py, slice(3, 6))]:
        gterm = jnp.stack([g_pcl32 @ p[0], g_kps32 @ p[0]], axis=1)  # (B, 2, C)
        outs = _run_bwd_one_head(pf32, gterm, d32[:, sl], p, n_pcl, interpret)
        results[name] = outs

    d_pf = results["x"][0] + results["y"][0]
    d_gx, d_gy = results["x"][1], results["y"][1]

    # input grads through the precomputed global terms: gterm = g @ W_g
    d_g_pcl = d_gx[:, 0, :] @ px[0].T + d_gy[:, 0, :] @ py[0].T
    d_g_kps = d_gx[:, 1, :] @ px[0].T + d_gy[:, 1, :] @ py[0].T
    d_wg = {
        "x": g_pcl32.T @ d_gx[:, 0, :] + g_kps32.T @ d_gx[:, 1, :],
        "y": g_pcl32.T @ d_gy[:, 0, :] + g_kps32.T @ d_gy[:, 1, :],
    }

    def head_grads(outs, d_wg_h):
        s = [jnp.sum(g, axis=0) for g in outs[2:14]]  # reduce over objects
        (d_w_pt, d_b0, d_gn0_s, d_gn0_b, d_w1, d_b1, d_gn1_s, d_gn1_b,
         d_neck_w, d_neck_b, d_pw, d_pb) = s
        return {
            "layer0_kernel": jnp.concatenate([d_wg_h, d_w_pt], axis=0),
            "layer0_bias": d_b0[0],
            "gn0": {"scale": d_gn0_s[0], "bias": d_gn0_b[0]},
            "layer1": {"Dense_0": {"kernel": d_w1, "bias": d_b1[0]}},
            "gn1": {"scale": d_gn1_s[0], "bias": d_gn1_b[0]},
            "neck": {"Dense_0": {"kernel": d_neck_w, "bias": d_neck_b[0]}},
            "point_weight": d_pw[0],
            "point_bias_param": jnp.sum(d_pb[0])[None],
        }

    d_params = {
        "rot_head_x": head_grads(results["x"], d_wg["x"]),
        "rot_head_y": head_grads(results["y"], d_wg["y"]),
    }
    return (d_pf.astype(point_feats.dtype), d_g_pcl.astype(g_pcl.dtype),
            d_g_kps.astype(g_kps.dtype), d_params)


fused_rot_head_train.defvjp(_fwd, _bwd)
