"""Custom-VJP fused encoder epilogues: forward parity vs the flax encoder
and gradient parity vs autodiff (CPU interpret mode, f32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from catre_tpu.models.pointnet import PointNetFeat
from catre_tpu.ops.pallas_encoder_epilogue_vjp import (
    dense_relu_dense_max_t,
    dense_relu_max_t,
    pointnet_encode_fused_train,
)

RNG = np.random.default_rng(11)
INTERP = True  # CPU


def test_dense_relu_max_value_and_grad():
    N, P, Cin, C = 4, 64, 128, 256
    x = jnp.asarray(RNG.normal(size=(N, P, Cin)).astype(np.float32) * 0.3)
    w = jnp.asarray(RNG.normal(size=(Cin, C)).astype(np.float32) * 0.1)
    b = jnp.asarray(RNG.normal(size=(C,)).astype(np.float32) * 0.1)

    def ref(x, w, b):
        return jnp.max(jnp.maximum(x @ w + b, 0), axis=1)

    got = dense_relu_max_t(x, w, b, INTERP, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, w, b)),
                               atol=1e-5)

    co = jnp.asarray(RNG.normal(size=(N, C)).astype(np.float32))

    def loss_k(x, w, b):
        return jnp.sum(dense_relu_max_t(x, w, b, INTERP, jnp.float32) * co)

    def loss_r(x, w, b):
        return jnp.sum(ref(x, w, b) * co)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-4)


def test_dense_relu_dense_max_value_and_grad():
    N, P, Cin, C3, C4 = 4, 64, 128, 256, 512
    x = jnp.asarray(RNG.normal(size=(N, P, Cin)).astype(np.float32) * 0.3)
    w3 = jnp.asarray(RNG.normal(size=(Cin, C3)).astype(np.float32) * 0.1)
    b3 = jnp.asarray(RNG.normal(size=(C3,)).astype(np.float32) * 0.1)
    w4 = jnp.asarray(RNG.normal(size=(C3, C4)).astype(np.float32) * 0.1)
    b4 = jnp.asarray(RNG.normal(size=(C4,)).astype(np.float32) * 0.1)

    def ref(x, w3, b3, w4, b4):
        return jnp.max(jnp.maximum(x @ w3 + b3, 0) @ w4 + b4, axis=1)

    got = dense_relu_dense_max_t(x, w3, b3, w4, b4, INTERP, jnp.float32)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref(x, w3, b3, w4, b4)), atol=1e-5)

    co = jnp.asarray(RNG.normal(size=(N, C4)).astype(np.float32))

    def loss_k(*a):
        return jnp.sum(dense_relu_dense_max_t(*a, INTERP, jnp.float32) * co)

    def loss_r(*a):
        return jnp.sum(ref(*a) * co)

    gk = jax.grad(loss_k, argnums=tuple(range(5)))(x, w3, b3, w4, b4)
    gr = jax.grad(loss_r, argnums=tuple(range(5)))(x, w3, b3, w4, b4)
    for a, bb in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-4)


def test_pointnet_encode_train_parity():
    """Full encode: values match flax; grads through BOTH outputs match
    autodiff of the flax module."""
    N, P = 2, 64
    enc = PointNetFeat(out_dim=1024, global_feat=False, feature_transform=True,
                       return_parts=True)
    x = jnp.asarray((RNG.normal(size=(N, P, 3)) * 0.2).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    pf_r, gf_r = enc.apply({"params": params}, x)
    pf_k, gf_k = pointnet_encode_fused_train(params, x, True, INTERP, jnp.float32)
    np.testing.assert_allclose(np.asarray(pf_k), np.asarray(pf_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_k), np.asarray(gf_r), atol=1e-5)

    c1 = jnp.asarray(RNG.normal(size=pf_r.shape).astype(np.float32))
    c2 = jnp.asarray(RNG.normal(size=gf_r.shape).astype(np.float32))

    def loss_k(p, x):
        pf, gf = pointnet_encode_fused_train(p, x, True, INTERP, jnp.float32)
        return jnp.sum(pf * c1) + jnp.sum(gf * c2)

    def loss_r(p, x):
        pf, gf = enc.apply({"params": p}, x)
        return jnp.sum(pf * c1) + jnp.sum(gf * c2)

    gk = jax.grad(loss_k, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_r, argnums=(0, 1))(params, x)
    flat_k = jax.tree_util.tree_leaves_with_path(gk[0])
    flat_r = dict(jax.tree_util.tree_leaves_with_path(gr[0]))
    for path, v in flat_k:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_r[path]), atol=5e-4,
            err_msg=jax.tree_util.keystr(path))
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]), atol=5e-4)
