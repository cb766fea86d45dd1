"""Custom-VJP fused encoder epilogues (training path).

Profile-driven (docs/PERF.md round-2 training profile): with the inference
epilogue fusion unavailable under autodiff, the training step materializes
every `-> 1024 -> max` tail activation in HBM — the (2B, P, 1024) conv4
output, the forward max reductions AND the (2B, P, 1024) predicate mask of
the max backward were ~95 ms of the 460 ms step at B=512.

These kernels make the tails differentiable with O(N, Cout) residuals:

  forward : fused dense(+relu+dense) + per-cloud max, ALSO emitting the
            argmax row index per (cloud, channel) — out (N, C), idx (N, C)
            int32; the (N, P, C) activation never leaves VMEM.
  backward: per cloud block, recompute the small pre-activations in VMEM,
            scatter d_out into the argmax rows via an iota-built one-hot,
            and run the five small GEMMs (dw4, dh3, dw3, dx, recompute)
            on the MXU. Gradients route to a SINGLE argmax row per channel
            (ties: lowest row index), vs autodiff's split-across-ties —
            identical off a measure-zero set.

Used by `pointnet_encode_fused_train` (the differentiable analogue of
`pallas_encoder_epilogue.pointnet_encode_fused`), behind
`CATREConfig.fused_encoder_train` / MODEL.FUSED_ENCODER_TRAIN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = 100 * 1024 * 1024


def _per_cloud_max_argmax(h, G, P):
    """(G*P, C) -> (out (G, C) f32, idx (G, C) int32); first-max row index."""
    outs, idxs = [], []
    for c in range(G):
        blk = h[c * P:(c + 1) * P].astype(jnp.float32)  # (P, C)
        m = jnp.max(blk, axis=0, keepdims=True)
        row_i = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        idx = jnp.min(jnp.where(blk == m, row_i, P), axis=0, keepdims=True)
        outs.append(m)
        idxs.append(idx)
    return jnp.concatenate(outs, axis=0), jnp.concatenate(idxs, axis=0)


def _routed_grad(idx, dout, G, P, C):
    """Scatter d_out (G, C) into the argmax rows: returns (G*P, C) f32 with
    row argmax[g, c] of cloud g carrying d_out[g, c] in column c. Built per
    cloud from an iota==idx compare — NO vectorized integer modulo (int
    div/mod lowers to a slow scalar loop on the VPU)."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, (P, C), 0)
    return jnp.concatenate([
        jnp.where(row_i == jnp.broadcast_to(idx[c:c + 1], (P, C)),
                  jnp.broadcast_to(dout[c:c + 1], (P, C)), 0.0)
        for c in range(G)
    ], axis=0)


# ---------------------------------------------------------------- kernel 1
# out = max_p relu(x @ w + b)   (STN conv3 tails)

def _fwd_kernel_1(cdt, G, P, x_ref, w_ref, b_ref, out_ref, idx_ref):
    xb = x_ref[...].reshape(G * P, x_ref.shape[-1])
    h = jnp.dot(xb.astype(cdt), w_ref[...].astype(cdt),
                preferred_element_type=jnp.float32).astype(cdt)
    h = jnp.maximum(h + b_ref[...].astype(cdt), 0)
    out, idx = _per_cloud_max_argmax(h, G, P)
    out_ref[...] = out
    idx_ref[...] = idx


def _bwd_kernel_1(cdt, G, P, x_ref, w_ref, b_ref, idx_ref, dout_ref,
                  dx_ref, dw_ref, db_ref):
    step = pl.program_id(0)
    xb = x_ref[...].reshape(G * P, x_ref.shape[-1])
    h = jnp.dot(xb.astype(cdt), w_ref[...].astype(cdt),
                preferred_element_type=jnp.float32)  # (G*P, C) f32, pre-relu+b
    h = h + b_ref[...]
    C = h.shape[1]
    d_h = _routed_grad(idx_ref[...], dout_ref[...], G, P, C)
    d_h = jnp.where(h > 0, d_h, 0.0).astype(cdt)  # relu gate
    dx_ref[...] = jnp.dot(d_h, w_ref[...].astype(cdt).T,
                          preferred_element_type=jnp.float32
                          ).reshape(x_ref.shape).astype(jnp.float32)
    d_w = jnp.dot(xb.astype(cdt).T, d_h, preferred_element_type=jnp.float32)
    d_b = jnp.sum(d_h.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(step == 0)
    def _init():
        dw_ref[...] = d_w
        db_ref[...] = d_b

    @pl.when(step != 0)
    def _acc():
        dw_ref[...] += d_w
        db_ref[...] += d_b


# ---------------------------------------------------------------- kernel 2
# out = max_p (relu(x @ w3 + b3) @ w4 + b4)   (main conv3 -> conv4 tail)

def _fwd_kernel_2(cdt, G, P, x_ref, w3_ref, b3_ref, w4_ref, b4_ref,
                  out_ref, idx_ref):
    xb = x_ref[...].reshape(G * P, x_ref.shape[-1])
    h = jnp.dot(xb.astype(cdt), w3_ref[...].astype(cdt),
                preferred_element_type=jnp.float32).astype(cdt)
    h = jnp.maximum(h + b3_ref[...].astype(cdt), 0)
    h = (jnp.dot(h, w4_ref[...].astype(cdt),
                 preferred_element_type=jnp.float32).astype(cdt)
         + b4_ref[...].astype(cdt))
    out, idx = _per_cloud_max_argmax(h, G, P)
    out_ref[...] = out
    idx_ref[...] = idx


def _bwd_kernel_2(cdt, G, P, x_ref, w3_ref, b3_ref, w4_ref, b4_ref, idx_ref,
                  dout_ref, dx_ref, dw3_ref, db3_ref, dw4_ref, db4_ref):
    step = pl.program_id(0)
    xb = x_ref[...].reshape(G * P, x_ref.shape[-1])
    h3p = jnp.dot(xb.astype(cdt), w3_ref[...].astype(cdt),
                  preferred_element_type=jnp.float32) + b3_ref[...]  # (G*P, C3) f32
    h3 = jnp.maximum(h3p, 0.0).astype(cdt)
    C4 = w4_ref.shape[1]
    # conv4 has no relu: d_h4 is d_out routed straight to the argmax rows
    d_h4 = _routed_grad(idx_ref[...], dout_ref[...], G, P, C4).astype(cdt)
    d_w4 = jnp.dot(h3.T, d_h4, preferred_element_type=jnp.float32)
    d_b4 = jnp.sum(d_h4.astype(jnp.float32), axis=0, keepdims=True)
    d_h3 = jnp.dot(d_h4, w4_ref[...].astype(cdt).T,
                   preferred_element_type=jnp.float32)
    d_h3 = jnp.where(h3p > 0, d_h3, 0.0).astype(cdt)
    d_w3 = jnp.dot(xb.astype(cdt).T, d_h3, preferred_element_type=jnp.float32)
    d_b3 = jnp.sum(d_h3.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[...] = jnp.dot(d_h3, w3_ref[...].astype(cdt).T,
                          preferred_element_type=jnp.float32
                          ).reshape(x_ref.shape).astype(jnp.float32)

    @pl.when(step == 0)
    def _init():
        dw3_ref[...] = d_w3
        db3_ref[...] = d_b3
        dw4_ref[...] = d_w4
        db4_ref[...] = d_b4

    @pl.when(step != 0)
    def _acc():
        dw3_ref[...] += d_w3
        db3_ref[...] += d_b3
        dw4_ref[...] += d_w4
        db4_ref[...] += d_b4


# ---------------------------------------------------------------- plumbing

def _grid(N, block):
    G = block
    while N % G:
        G //= 2
    return G


def _fwd_call(kernel, x, params, n_out, block, interpret, cdt):
    N, P, cin = x.shape
    G = _grid(N, block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // G,),
        in_specs=[pl.BlockSpec((G, P, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params],
        out_specs=(pl.BlockSpec((G, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((G, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM)),
    )
    return pl.pallas_call(
        partial(kernel, cdt, G, P),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((N, n_out), jnp.float32),
                   jax.ShapeDtypeStruct((N, n_out), jnp.int32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(x, *params)


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _bwd_call_1(x, w, b, idx, dout, block, interpret, cdt):
    N, P, cin = x.shape
    C = w.shape[1]
    G = _grid(N, block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, P, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _full(), _full(),
            pl.BlockSpec((G, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, P, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        partial(_bwd_kernel_1, cdt, G, P),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((N, P, cin), jnp.float32),
                   jax.ShapeDtypeStruct((cin, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(x, w, b, idx, dout)


def _bwd_call_2(x, w3, b3, w4, b4, idx, dout, block, interpret, cdt):
    N, P, cin = x.shape
    C3, C4 = w3.shape[1], w4.shape[1]
    G = _grid(N, block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, P, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _full(), _full(), _full(), _full(),
            pl.BlockSpec((G, C4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, C4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, P, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, C3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C3, C4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        partial(_bwd_kernel_2, cdt, G, P),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((N, P, cin), jnp.float32),
                   jax.ShapeDtypeStruct((cin, C3), jnp.float32),
                   jax.ShapeDtypeStruct((1, C3), jnp.float32),
                   jax.ShapeDtypeStruct((C3, C4), jnp.float32),
                   jax.ShapeDtypeStruct((1, C4), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(x, w3, b3, w4, b4, idx, dout)


# forward block size 16 matches the inference kernels; backward uses 8 to
# stay inside the VMEM stack (d_h4/h3/S at (G*P, 1024))
_FWD_BLOCK = 16
_BWD_BLOCK = 8


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dense_relu_max_t(x, w, b, interpret: bool = False,
                     compute_dtype=jnp.bfloat16):
    """Differentiable max_p relu(x @ w + b); x (N, P, Cin) -> (N, Cout)."""
    cdt = jnp.float32 if interpret else compute_dtype
    out, _ = _fwd_call(_fwd_kernel_1, x,
                       [w.astype(jnp.float32), b.astype(jnp.float32).reshape(1, -1)],
                       w.shape[1], _FWD_BLOCK, interpret, cdt)
    return out


def _drm_fwd(x, w, b, interpret, compute_dtype):
    cdt = jnp.float32 if interpret else compute_dtype
    wf = w.astype(jnp.float32)
    bf = b.astype(jnp.float32).reshape(1, -1)
    out, idx = _fwd_call(_fwd_kernel_1, x, [wf, bf], w.shape[1], _FWD_BLOCK,
                         interpret, cdt)
    return out, (x, wf, bf, idx)


def _drm_bwd(interpret, compute_dtype, res, d_out):
    x, wf, bf, idx = res
    cdt = jnp.float32 if interpret else compute_dtype
    d_x, d_w, d_b = _bwd_call_1(x, wf, bf, idx, d_out.astype(jnp.float32),
                                _BWD_BLOCK, interpret, cdt)
    return d_x.astype(x.dtype), d_w, d_b.reshape(-1)


dense_relu_max_t.defvjp(_drm_fwd, _drm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dense_relu_dense_max_t(x, w3, b3, w4, b4, interpret: bool = False,
                           compute_dtype=jnp.bfloat16):
    """Differentiable max_p (relu(x @ w3 + b3) @ w4 + b4)."""
    cdt = jnp.float32 if interpret else compute_dtype
    params = [w3.astype(jnp.float32), b3.astype(jnp.float32).reshape(1, -1),
              w4.astype(jnp.float32), b4.astype(jnp.float32).reshape(1, -1)]
    out, _ = _fwd_call(_fwd_kernel_2, x, params, w4.shape[1], _FWD_BLOCK,
                       interpret, cdt)
    return out


def _drdm_fwd(x, w3, b3, w4, b4, interpret, compute_dtype):
    cdt = jnp.float32 if interpret else compute_dtype
    p = [w3.astype(jnp.float32), b3.astype(jnp.float32).reshape(1, -1),
         w4.astype(jnp.float32), b4.astype(jnp.float32).reshape(1, -1)]
    out, idx = _fwd_call(_fwd_kernel_2, x, p, w4.shape[1], _FWD_BLOCK,
                         interpret, cdt)
    return out, (x, p[0], p[1], p[2], p[3], idx)


def _drdm_bwd(interpret, compute_dtype, res, d_out):
    x, w3, b3, w4, b4, idx = res
    cdt = jnp.float32 if interpret else compute_dtype
    d_x, d_w3, d_b3, d_w4, d_b4 = _bwd_call_2(
        x, w3, b3, w4, b4, idx, d_out.astype(jnp.float32), _BWD_BLOCK,
        interpret, cdt)
    return d_x.astype(x.dtype), d_w3, d_b3.reshape(-1), d_w4, d_b4.reshape(-1)


dense_relu_dense_max_t.defvjp(_drdm_fwd, _drdm_bwd)


def pointnet_encode_fused_train(params, x, feature_transform=True,
                                interpret=False, compute_dtype=jnp.bfloat16):
    """Differentiable PointNetFeat forward with the three `-> 1024 -> max`
    tails running through the custom-VJP fused kernels; numerics match
    `pallas_encoder_epilogue.pointnet_encode_fused` / the flax module.
    Returns (pointfeat (N, P, 64), gfeat (N, out_dim))."""
    from .pallas_encoder_epilogue import encode_body

    cdt = jnp.float32 if interpret else compute_dtype
    return encode_body(
        params, x, feature_transform, cdt,
        lambda g, k, b: dense_relu_max_t(g, k, b, interpret, compute_dtype),
        lambda h, k3, b3, k4, b4: dense_relu_dense_max_t(
            h, k3, b3, k4, b4, interpret, compute_dtype),
    )
