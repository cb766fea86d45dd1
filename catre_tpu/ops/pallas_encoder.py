"""Fused PointNet column kernels.

The encoder's FLOPs live in per-point matmul chains ending in a max-pool
over points (`models/pointnet.py`): as separate XLA ops each intermediate
(B, P, {128, 512, 1024}) round-trips HBM.  Per cloud everything fits in VMEM,
so `chain3_max` runs one cloud per grid step: three matmuls (+bias, ReLU
after the first two, optional after the third) with the max-pool folded in —
reads (P, C_in) once, writes (C_out,) once.

Covers:
  - the main tail  conv2->conv3->conv4, max        (relu_last=False)
  - the STN tails  conv1->conv2->conv3, relu, max  (relu_last=True)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(relu_last: bool, cdt, n_clouds: int, P: int, x_ref, w1_ref,
                  b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
    # matmuls run in the compute dtype (bf16 on TPU -> full MXU rate) with
    # f32 accumulation; the max-pool output is f32.  n_clouds > 1 flattens
    # the clouds into ONE (n_clouds*P, C) matmul chain (good MXU fill,
    # amortized grid overhead) — needs the raised scoped-VMEM limit.
    w1, b1 = w1_ref[...], b1_ref[...]
    w2, b2 = w2_ref[...], b2_ref[...]
    w3, b3 = w3_ref[...], b3_ref[...]

    x = x_ref[...].reshape(n_clouds * P, x_ref.shape[2]).astype(cdt)
    h = jnp.maximum(jnp.dot(x, w1, preferred_element_type=jnp.float32)
                    + b1, 0.0).astype(cdt)
    h = jnp.maximum(jnp.dot(h, w2, preferred_element_type=jnp.float32)
                    + b2, 0.0).astype(cdt)
    h = jnp.dot(h, w3, preferred_element_type=jnp.float32) + b3
    if relu_last:
        h = jnp.maximum(h, 0.0)

    pads = jnp.full((7, w3.shape[1]), -jnp.inf, jnp.float32)
    pieces = []
    for c in range(n_clouds):
        m = jnp.max(h[c * P : (c + 1) * P], axis=0, keepdims=True)  # (1, C_out)
        pieces.append(m)
        pieces.append(pads)
    out_ref[0] = jnp.concatenate(pieces, axis=0)  # (n_clouds*8, C_out)


@partial(jax.jit, static_argnames=("relu_last", "interpret", "compute_dtype",
                                   "block_clouds"))
def chain3_max(x: jnp.ndarray, w1, b1, w2, b2, w3, b3,
               relu_last: bool = False, interpret: bool = False,
               compute_dtype=jnp.bfloat16, block_clouds: int = 8) -> jnp.ndarray:
    """max over points of chain(x): (B, P, C_in) -> (B, C_out) f32.

    Weights are flax Dense kernels (in, out); biases 1-D.
    """
    B, P, _ = x.shape
    c_out = w3.shape[1]
    cdt = jnp.float32 if interpret else compute_dtype
    C = block_clouds
    while B % C:
        C //= 2
    C = max(C, 1)

    def prep_w(w):
        return w.astype(cdt)

    def prep_b(b):
        return b.astype(jnp.float32).reshape(1, -1)

    args = [prep_w(w1), prep_b(b1), prep_w(w2), prep_b(b2), prep_w(w3), prep_b(b3)]

    out = pl.pallas_call(
        partial(_chain_kernel, relu_last, cdt, C, P),
        grid=(B // C,),
        in_specs=[
            pl.BlockSpec((C, P, x.shape[2]), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec((1, C * 8, c_out), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // C, C * 8, c_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *args)
    return out.reshape(B, 8, c_out)[:, 0, :]


def _dense_params(tree: dict):
    d = tree["Dense_0"]
    return d["kernel"], d["bias"]


def stn_forward_fused(params: dict, x: jnp.ndarray, k: int,
                      interpret: bool = False) -> jnp.ndarray:
    """STN (models/pointnet.py STN) with the conv column fused.

    Args:
      params: flax param subtree of one STN; x: (B, P, k)
    Returns:
      (B, k, k) transforms (identity-added).
    """
    w1, b1 = _dense_params(params["conv1"])
    w2, b2 = _dense_params(params["conv2"])
    w3, b3 = _dense_params(params["conv3"])
    g = chain3_max(x, w1, b1, w2, b2, w3, b3, relu_last=True, interpret=interpret)
    h = jax.nn.relu(g @ params["fc1"]["Dense_0"]["kernel"] + params["fc1"]["Dense_0"]["bias"])
    h = jax.nn.relu(h @ params["fc2"]["Dense_0"]["kernel"] + params["fc2"]["Dense_0"]["bias"])
    h = h @ params["fc3"]["Dense_0"]["kernel"] + params["fc3"]["Dense_0"]["bias"]
    iden = jnp.eye(k, dtype=h.dtype).reshape(1, k * k)
    return (h + iden).reshape(-1, k, k)


def pointnet_forward_fused(params: dict, x: jnp.ndarray, feature_transform: bool = True,
                           interpret: bool = False):
    """PointNetFeat forward with fused STN columns and fused conv2..4+max
    tail. Returns (pointfeat (B, P, 64), gfeat (B, out_dim)) — the factored
    form consumed by the heads.
    """
    trans = stn_forward_fused(params["stn"], x, k=3, interpret=interpret)
    x = jnp.einsum("bpi,bij->bpj", x, trans)
    w1, b1 = _dense_params(params["conv1"])
    x = jax.nn.relu(x @ w1 + b1)  # (B, P, 64)
    if feature_transform:
        tf = stn_forward_fused(params["fstn"], x, k=64, interpret=interpret)
        x = jnp.einsum("bpi,bij->bpj", x, tf)
    pointfeat = x
    w2, b2 = _dense_params(params["conv2"])
    w3, b3 = _dense_params(params["conv3"])
    w4, b4 = _dense_params(params["conv4"])
    gfeat = chain3_max(pointfeat, w2, b2, w3, b3, w4, b4, relu_last=False,
                       interpret=interpret)
    return pointfeat, gfeat
