"""Surgical encoder epilogue fusion: dense(+relu+dense) + per-cloud max.

The PointNet encoder (models/pointnet.py) is MXU-roofline-bound on its big
batched GEMMs — whole-encoder Pallas fusion measured SLOWER than XLA
(docs/PERF.md) — but its three `... -> 1024 -> max` tails each materialize a
(N*P, 1024) activation in HBM (≈17 GB per refine iteration at the b=4096
operating point) only to reduce it to (N, 1024).  These kernels keep the big
GEMM on the MXU and fold the max into its epilogue so that tensor never
leaves VMEM:

  - fused_dense_relu_max:        max_P relu(x @ w + b)          (STN conv3)
  - fused_dense_relu_dense_max:  max_P (relu(x @ w3 + b3) @ w4 + b4)
                                 (main conv3 -> conv4 -> max; conv4 has no
                                 relu — reference `pointnet.py:82-120`)

Grid = blocks of G clouds; each step runs a (G*P, Cin) x (Cin, Cout) matmul
(full MXU tiles for G*P >= 2048) and G static-slice max-reductions.  bf16
operands / f32 accumulation, activations cast to the compute dtype between
layers exactly like the flax path (parity-tested in
tests/test_encoder_epilogue.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _max_per_cloud(h, G, P):
    """(G*P, C) -> (G, C) segment max via static slices (no lane-split
    reshapes on Mosaic)."""
    rows = [jnp.max(h[c * P:(c + 1) * P], axis=0, keepdims=True)
            for c in range(G)]
    return jnp.concatenate(rows, axis=0)


def _kernel_1(cdt, G, P, x_ref, w_ref, b_ref, out_ref):
    # matmul accumulates f32 (Mosaic requires a 32-bit acc); the result is
    # immediately rounded to cdt — exactly flax Dense(dtype=bf16)
    xb = x_ref[...].reshape(G * P, x_ref.shape[-1])
    h = jnp.dot(xb.astype(cdt), w_ref[...].astype(cdt),
                preferred_element_type=jnp.float32).astype(cdt)
    h = jnp.maximum(h + b_ref[...].astype(cdt), 0)
    out_ref[...] = _max_per_cloud(h.astype(jnp.float32), G, P)


def _kernel_2(cdt, G, P, x_ref, w3_ref, b3_ref, w4_ref, b4_ref, out_ref):
    xb = x_ref[...].reshape(G * P, x_ref.shape[-1])
    h = jnp.dot(xb.astype(cdt), w3_ref[...].astype(cdt),
                preferred_element_type=jnp.float32).astype(cdt)
    h = jnp.maximum(h + b3_ref[...].astype(cdt), 0)  # relu in compute dtype
    h = (jnp.dot(h, w4_ref[...].astype(cdt),
                 preferred_element_type=jnp.float32).astype(cdt)
         + b4_ref[...].astype(cdt))
    out_ref[...] = _max_per_cloud(h.astype(jnp.float32), G, P)


def _call(kernel, x, params, n_out, block_clouds, interpret, compute_dtype):
    N, P, cin = x.shape
    G = block_clouds
    while N % G:
        G //= 2
    cdt = jnp.float32 if interpret else compute_dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // G,),
        in_specs=[pl.BlockSpec((G, P, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params],
        out_specs=pl.BlockSpec((G, n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(kernel, cdt, G, P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *params)


@partial(jax.jit, static_argnames=("block_clouds", "interpret", "compute_dtype"))
def fused_dense_relu_max(x, kernel, bias, block_clouds=16, interpret=False,
                         compute_dtype=jnp.bfloat16):
    """max over P of relu(x @ kernel + bias); x (N, P, Cin) -> (N, Cout)."""
    params = [kernel.astype(jnp.float32), bias.astype(jnp.float32).reshape(1, -1)]
    return _call(_kernel_1, x, params, kernel.shape[1], block_clouds,
                 interpret, compute_dtype)


@partial(jax.jit, static_argnames=("block_clouds", "interpret", "compute_dtype"))
def fused_dense_relu_dense_max(x, k3, b3, k4, b4, block_clouds=16,
                               interpret=False, compute_dtype=jnp.bfloat16):
    """max over P of (relu(x @ k3 + b3) @ k4 + b4); x (N, P, Cin) -> (N, C4)."""
    params = [k3.astype(jnp.float32), b3.astype(jnp.float32).reshape(1, -1),
              k4.astype(jnp.float32), b4.astype(jnp.float32).reshape(1, -1)]
    return _call(_kernel_2, x, params, k4.shape[1], block_clouds,
                 interpret, compute_dtype)


def encode_body(params, x, feature_transform, cdt, tail_relu_max,
                tail_relu_dense_max):
    """PointNetFeat forward (return_parts semantics) parameterized over the
    two `-> 1024 -> max` tail implementations; everything else is plain XLA.
    Shared by the inference wrapper below and the custom-VJP training
    wrapper (ops/pallas_encoder_epilogue_vjp.py) so the encoder orchestration
    exists ONCE — any structural change stays in lockstep across both paths.

    tail_relu_max(g, kernel, bias) -> (N, Cout)         (STN conv3 tails)
    tail_relu_dense_max(h, k3, b3, k4, b4) -> (N, C4)   (main conv3->conv4)
    Returns (pointfeat (N, P, 64), gfeat (N, out_dim)).
    """

    def dense(p, h, act=True):
        k = p["Dense_0"]["kernel"].astype(cdt)
        b = p["Dense_0"]["bias"].astype(cdt)
        out = jnp.dot(h.astype(cdt), k, preferred_element_type=jnp.float32)
        out = (out.astype(cdt) + b)
        return jnp.maximum(out, 0) if act else out

    def stn(p, h, k):
        g = dense(p["conv2"], dense(p["conv1"], h))          # (N, P, 128)
        pooled = tail_relu_max(
            g, p["conv3"]["Dense_0"]["kernel"], p["conv3"]["Dense_0"]["bias"],
        ).astype(cdt)                                        # (N, 1024)
        f = dense(p["fc2"], dense(p["fc1"], pooled))
        f = dense(p["fc3"], f, act=False)                    # (N, k*k)
        iden = jnp.eye(k, dtype=f.dtype).reshape(1, k * k)
        return (f + iden).reshape(-1, k, k)

    trans = stn(params["stn"], x, 3)
    x = jnp.einsum("bpi,bij->bpj", x.astype(trans.dtype), trans)
    x = dense(params["conv1"], x)                            # (N, P, 64)
    if feature_transform:
        tf = stn(params["fstn"], x, 64)
        x = jnp.einsum("bpi,bij->bpj", x, tf)
    pointfeat = x
    h = dense(params["conv2"], x)                            # (N, P, 128)
    gfeat = tail_relu_dense_max(
        h, params["conv3"]["Dense_0"]["kernel"], params["conv3"]["Dense_0"]["bias"],
        params["conv4"]["Dense_0"]["kernel"], params["conv4"]["Dense_0"]["bias"],
    )
    return pointfeat, gfeat


def pointnet_encode_fused(params, x, feature_transform=True, interpret=False,
                          compute_dtype=jnp.bfloat16, block_clouds=16):
    """PointNetFeat forward (return_parts semantics) with the three
    `-> 1024 -> max` tails fused; everything else stays in XLA.

    `params`: the flax PointNetFeat subtree (models/pointnet.py).
    Returns (pointfeat (N, P, 64), gfeat (N, out_dim)).
    """
    cdt = jnp.float32 if interpret else compute_dtype
    kw = dict(block_clouds=block_clouds, interpret=interpret,
              compute_dtype=compute_dtype)
    return encode_body(
        params, x, feature_transform, cdt,
        lambda g, k, b: fused_dense_relu_max(g, k, b, **kw),
        lambda h, k3, b3, k4, b4: fused_dense_relu_dense_max(h, k3, b3, k4, b4, **kw),
    )
