"""Custom-VJP fused rotation head: Pallas forward AND backward.

The unfused rot head dominates the training step's HBM traffic the same way
it does inference's (fwd + bwd each stream (B, P+K, 256) activations).  Here
the backward recomputes the forward entirely in VMEM per object (residuals =
just the inputs) and emits input gradients plus PER-OBJECT parameter
gradients; the cross-object parameter-grad reduction and the W_g/g grads are
cheap XLA contractions outside the kernel.

Both per-axis heads run JOINTLY as (P, 512) tensors (columns [0:256] = head
x, [256:512] = head y), mirroring the inference kernel (pallas_heads._kernel):
one grid step per object instead of two, half the kernel launches and tiny
matmuls.  Layer-1 dots stay per-head (channel mixing must not cross heads).

VMEM discipline: the big (P, 512) buffers are kept in the compute dtype
(bf16 on TPU, f32 in interpreter mode); normalized GN tensors are never
stored — they are recomputed from the kept pre-GN activations plus the tiny
per-group stats (~42MB peak; the scoped limit is raised to 100MB, v5e has
128MB VMEM).

Validated against jax.grad of the flax ConvOutPerRotHead in interpreter mode
(tests/test_pallas_vjp.py). Enable with CATREConfig.fused_heads_train.

Math (per head, per object; P rows = P_pcl + K_kps, C = feat_dim):
  x0 = pf @ W_pt + g_sel + b0
  x1 = gelu(GN0(x0));  x2 = x1 @ W1 + b1;  x3 = gelu(GN1(x2))
  v  = pw @ x3;  out = v @ Wn + sum(pw) * bn + pb
GN backward (per group, n = P * C/G elements, y = (x - mu) * inv):
  dx = inv * (dy - mean(dy) - y * mean(dy * y))    [means over the group]
GELU' = Phi(x) + x * phi(x); Phi is the FMA-only polynomial from
pallas_heads (1.6e-6 — the tanh-form 2.6e-5 used by the inference kernel is
too coarse for the x50-scaled gradient stress test), phi rides hardware exp.
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
    """(mean_c (1,C), inv_c (1,C)) of GN over a (P, C) block (f32); the two
    stats rows ride one matmul each way (see pallas_heads._group_norm_rows)."""
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=0, keepdims=True)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
    g12 = jnp.dot(jnp.concatenate([s1, s2], axis=0), M,
                  preferred_element_type=jnp.float32)  # (2, G)
    mean_g = g12[0:1] / n
    var_g = g12[1:2] / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + 1e-5)
    mi_c = jnp.dot(jnp.concatenate([mean_g, inv_g], axis=0), M.T,
                   preferred_element_type=jnp.float32)  # (2, C)
    return mi_c[0:1], mi_c[1:2]


def _gn_bwd_from_stats(d_out, x, mean_c, inv_c, scale, M, n, cdt):
    """GN backward recomputing y from (x, stats). All (P, C) tensors live in
    `cdt` (bf16 on TPU) to stay inside the VMEM stack budget; the per-group
    reductions accumulate in f32. Returns (d_x (P,C) cdt, d_scale, d_bias)."""
    y = ((x.astype(jnp.float32) - mean_c) * inv_c).astype(cdt)
    d_scale = jnp.sum(d_out.astype(jnp.float32) * y.astype(jnp.float32),
                      axis=0, keepdims=True)
    d_bias = jnp.sum(d_out.astype(jnp.float32), axis=0, keepdims=True)
    dy = (d_out.astype(jnp.float32) * scale).astype(cdt)
    s_dy = jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    s_dyy = jnp.sum(dy.astype(jnp.float32) * y.astype(jnp.float32),
                    axis=0, keepdims=True)
    m12 = jnp.dot(jnp.dot(jnp.concatenate([s_dy, s_dyy], axis=0), M,
                          preferred_element_type=jnp.float32) / n, M.T,
                  preferred_element_type=jnp.float32)  # (2, C)
    d_x = ((dy.astype(jnp.float32) - m12[0:1] - y.astype(jnp.float32) * m12[1:2])
           * inv_c).astype(cdt)
    return d_x, d_scale, d_bias


def _bwd_kernel(cdt, n_pcl_ref, pf_ref, g_ref, dout_ref,
                w_pt_ref, b0_ref, gn0s_ref, gn0b_ref, w1x_ref, w1y_ref,
                b1_ref, gn1s_ref, gn1b_ref, pw2_ref, neckbd_ref,
                d_pf_ref, d_g_ref, d_w_pt_ref, d_b0_ref, d_gn0s_ref,
                d_gn0b_ref, d_w1x_ref, d_w1y_ref, d_b1_ref, d_gn1s_ref,
                d_gn1b_ref, d_pw2_ref, d_neckbd_ref):
    """Grid step = one object, BOTH heads joint at C=512 (64 GN groups)."""
    w_pt = w_pt_ref[...]
    b0 = b0_ref[...]
    gn0_s, gn0_b = gn0s_ref[...], gn0b_ref[...]
    w1x, w1y = w1x_ref[...], w1y_ref[...]
    b1 = b1_ref[...]
    gn1_s, gn1_b = gn1s_ref[...], gn1b_ref[...]
    pw2 = pw2_ref[...]            # (2, P)
    neckbd = neckbd_ref[...]      # (512, 6) block-diagonal

    n_pcl = n_pcl_ref[0]
    pf = pf_ref[0].astype(cdt)    # (P, cin)
    P = pf.shape[0]
    C = 512
    row = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    is_pcl = row < n_pcl
    M = _group_onehot(C, 64)
    n = P * (C // 64)
    d_out = dout_ref[0].astype(jnp.float32)  # (1, 6)

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
    x2 = (jnp.concatenate([
        jnp.dot(x1[:, :256], w1x.astype(cdt), preferred_element_type=jnp.float32),
        jnp.dot(x1[:, 256:], w1y.astype(cdt), preferred_element_type=jnp.float32),
    ], axis=1) + b1).astype(cdt)
    mean1, inv1 = _gn_stats(x2, M, n)

    def h1_of(x2_):
        y1 = (x2_.astype(jnp.float32) - mean1) * inv1
        return y1 * gn1_s + gn1_b

    h1 = h1_of(x2)
    x3 = _gelu(h1).astype(cdt)
    v2 = jnp.dot(pw2.astype(cdt), x3, preferred_element_type=jnp.float32)  # (2, C)
    cmask = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) < 256
    vcat = jnp.where(cmask, v2[0:1], v2[1:2])  # (1, C)

    # ---- backward
    # out6 = vcat @ neckbd (+ bias terms handled outside the kernel)
    d_neckbd = jnp.dot(vcat.T, d_out, preferred_element_type=jnp.float32)  # (C, 6)
    d_vcat = jnp.dot(d_out, neckbd.T, preferred_element_type=jnp.float32)  # (1, C)
    zero_row = jnp.zeros_like(d_vcat)
    d_v2 = jnp.concatenate([
        jnp.where(cmask, d_vcat, zero_row),
        jnp.where(cmask, zero_row, d_vcat),
    ], axis=0)  # (2, C)
    d_x3 = jnp.dot(pw2.T.astype(cdt), d_v2.astype(cdt),
                   preferred_element_type=jnp.float32)  # (P, C)
    d_pw2 = jnp.dot(x3, d_v2.T.astype(cdt),
                    preferred_element_type=jnp.float32).T  # (2, P)

    d_h1 = d_x3 * _gelu_grad(h1)
    d_x2, d_gn1_s, d_gn1_b = _gn_bwd_from_stats(d_h1, x2, mean1, inv1, gn1_s, M, n, cdt)
    d_w1x = jnp.dot(x1[:, :256].T, d_x2[:, :256], preferred_element_type=jnp.float32)
    d_w1y = jnp.dot(x1[:, 256:].T, d_x2[:, 256:], preferred_element_type=jnp.float32)
    d_b1 = jnp.sum(d_x2.astype(jnp.float32), axis=0, keepdims=True)
    d_x1 = jnp.concatenate([
        jnp.dot(d_x2[:, :256], w1x.T.astype(cdt), preferred_element_type=jnp.float32),
        jnp.dot(d_x2[:, 256:], w1y.T.astype(cdt), preferred_element_type=jnp.float32),
    ], axis=1)

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
    # parameter grads ACCUMULATE in-kernel across the sequential object grid
    # (constant output blocks + pl.when): the per-object (B, shape) grad
    # materialization + XLA batch-reduce this replaces was ~350 MB of HBM
    # round-trips per step at B=512
    grads = [d_w_pt, d_b0, d_gn0_s, d_gn0_b, d_w1x, d_w1y, d_b1, d_gn1_s,
             d_gn1_b, d_pw2, d_neckbd]
    refs = [d_w_pt_ref, d_b0_ref, d_gn0s_ref, d_gn0b_ref, d_w1x_ref,
            d_w1y_ref, d_b1_ref, d_gn1s_ref, d_gn1b_ref, d_pw2_ref,
            d_neckbd_ref]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref, g in zip(refs, grads):
            ref[...] = g

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        for ref, g in zip(refs, grads):
            ref[...] += g


def _run_bwd_joint(point_feats, gterm, d_out6, merged, n_pcl, interpret):
    """One pallas call over all objects; `merged` = [w_pt, b0, gn0s, gn0b,
    w1x, w1y, b1, gn1s, gn1b, pw2, neckbd]."""
    B, P, cin = point_feats.shape
    C = 512
    cdt = jnp.float32 if interpret else jnp.bfloat16

    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in merged]

    def per_obj(shape):
        return pl.BlockSpec((1,) + shape, lambda b, *_: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    gshapes = [
        (cin, C), (1, C), (1, C), (1, C), (256, 256), (256, 256), (1, C),
        (1, C), (1, C), (2, P), (C, 6),
    ]

    def accum(shape):
        # constant block: every grid step revisits it (in-kernel accumulation)
        return pl.BlockSpec(shape, lambda b, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_shapes = ([jax.ShapeDtypeStruct((B, P, cin), jnp.float32),
                   jax.ShapeDtypeStruct((B, 2, C), jnp.float32)]
                  + [jax.ShapeDtypeStruct(s, jnp.float32) for s in gshapes])
    out_specs = ([per_obj((P, cin)), per_obj((2, C))] + [accum(s) for s in gshapes])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, cin), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 6), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + param_specs,
        out_specs=tuple(out_specs),
    )

    n_pcl_arr = jnp.full((1,), n_pcl, dtype=jnp.int32)
    return pl.pallas_call(
        partial(_bwd_kernel, cdt),
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        # the joint recompute backward needs ~42MB of stack; v5e VMEM is
        # 128MB — raise the scoped limit above the 16MB default
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(n_pcl_arr, point_feats, gterm, d_out6.reshape(-1, 1, 6), *merged)


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

    # merged joint-head parameter blocks (matches pallas_heads forward)
    z = jnp.zeros_like(px[9])
    merged = [
        jnp.concatenate([px[1], py[1]], axis=1),   # w_pt (cin, 512)
        jnp.concatenate([px[2], py[2]], axis=1),   # b0
        jnp.concatenate([px[3], py[3]], axis=1),   # gn0s
        jnp.concatenate([px[4], py[4]], axis=1),   # gn0b
        px[5], py[5],                              # w1x, w1y
        jnp.concatenate([px[6], py[6]], axis=1),   # b1
        jnp.concatenate([px[7], py[7]], axis=1),   # gn1s
        jnp.concatenate([px[8], py[8]], axis=1),   # gn1b
        jnp.concatenate([px[11], py[11]], axis=0),  # pw2 (2, P)
        jnp.concatenate([
            jnp.concatenate([px[9], z], axis=1),
            jnp.concatenate([z, py[9]], axis=1),
        ], axis=0),                                # neckbd (512, 6)
    ]

    pf32 = point_feats.astype(jnp.float32)
    g_pcl32 = g_pcl.astype(jnp.float32)
    g_kps32 = g_kps.astype(jnp.float32)
    d32 = d_out.astype(jnp.float32)

    g_both = jnp.stack([g_pcl32, g_kps32], axis=1)           # (B, 2, 1024)
    w_g = jnp.concatenate([px[0], py[0]], axis=1)            # (1024, 512)
    gterm = jnp.einsum("bkc,cd->bkd", g_both, w_g)           # (B, 2, 512)

    outs = _run_bwd_joint(pf32, gterm, d32, merged, n_pcl, interpret)
    (d_pf, d_g, d_w_pt, d_b0, d_gn0s, d_gn0b, d_w1x, d_w1y, d_b1, d_gn1s,
     d_gn1b, d_pw2, d_neckbd) = outs

    # input grads through the precomputed global terms: gterm = g @ W_g
    d_g_pcl = d_g[:, 0, :] @ w_g.T
    d_g_kps = d_g[:, 1, :] @ w_g.T
    # W_g grads per head = columns of the joint d_wg
    d_wg = g_pcl32.T @ d_g[:, 0, :] + g_kps32.T @ d_g[:, 1, :]  # (1024, 512)

    # param grads arrive batch-accumulated from the kernel
    rw_pt = d_w_pt          # (cin, 512)
    rb0 = d_b0[0]           # (512,)
    rgn0s = d_gn0s[0]
    rgn0b = d_gn0b[0]
    rw1x = d_w1x
    rw1y = d_w1y
    rb1 = d_b1[0]
    rgn1s = d_gn1s[0]
    rgn1b = d_gn1b[0]
    rpw2 = d_pw2            # (2, P)
    rneck = d_neckbd        # (512, 6)

    # bias-path grads (out6 += sum(pw)*neck_b + pb), handled outside:
    d_sum = jnp.sum(d32, axis=0, keepdims=True)              # (1, 6)
    d_neck_b_x = jnp.sum(px[11]) * d_sum[:, :3]
    d_neck_b_y = jnp.sum(py[11]) * d_sum[:, 3:]
    # d(sum(pw)) = neck_b . d_out, a constant added to every pw entry
    pw_extra_x = d32[:, :3] @ px[10].reshape(3, 1)           # (B, 1)
    pw_extra_y = d32[:, 3:] @ py[10].reshape(3, 1)

    def head_grads(sl, d_wg_cols, rw1, rneck_rows, rneck_cols, d_neck_b,
                   pw_row, pw_extra, pb_cols):
        return {
            "layer0_kernel": jnp.concatenate(
                [d_wg_cols, rw_pt[:, sl]], axis=0),
            "layer0_bias": rb0[sl],
            "gn0": {"scale": rgn0s[sl], "bias": rgn0b[sl]},
            "layer1": {"Dense_0": {"kernel": rw1, "bias": rb1[sl]}},
            "gn1": {"scale": rgn1s[sl], "bias": rgn1b[sl]},
            "neck": {"Dense_0": {
                "kernel": rneck[rneck_rows, rneck_cols],
                "bias": d_neck_b[0]}},
            "point_weight": rpw2[pw_row] + jnp.sum(pw_extra),
            "point_bias_param": jnp.sum(pb_cols)[None],
        }

    slx, sly = slice(0, 256), slice(256, 512)
    d_params = {
        "rot_head_x": head_grads(
            slx, d_wg[:, slx], rw1x, slx, slice(0, 3), d_neck_b_x, 0,
            pw_extra_x, d_sum[:, :3]),
        "rot_head_y": head_grads(
            sly, d_wg[:, sly], rw1y, sly, slice(3, 6), d_neck_b_y, 1,
            pw_extra_y, d_sum[:, 3:]),
    }
    return (d_pf.astype(point_feats.dtype), d_g_pcl.astype(g_pcl.dtype),
            d_g_kps.astype(g_kps.dtype), d_params)


fused_rot_head_train.defvjp(_fwd, _bwd)
