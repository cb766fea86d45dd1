"""Fused encoder epilogue (dense[+relu+dense] + per-cloud max) must match the
flax PointNetFeat bit-for-bit in f32 interpreter mode."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.models.pointnet import PointNetFeat
from catre_tpu.ops.pallas_encoder_epilogue import (
    fused_dense_relu_dense_max,
    fused_dense_relu_max,
    pointnet_encode_fused,
)


def test_dense_relu_max_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 64, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32) * 0.1)
    ref = jnp.max(jax.nn.relu(x @ w + b), axis=1)
    out = fused_dense_relu_max(x, w, b, block_clouds=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dense_relu_dense_max_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 32, 128)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32) * 0.05)
    b3 = jnp.asarray(rng.normal(size=(256,)).astype(np.float32) * 0.1)
    w4 = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32) * 0.05)
    b4 = jnp.asarray(rng.normal(size=(512,)).astype(np.float32) * 0.1)
    ref = jnp.max(jax.nn.relu(x @ w3 + b3) @ w4 + b4, axis=1)
    out = fused_dense_relu_dense_max(x, w3, b3, w4, b4, block_clouds=8,
                                     interpret=True)
    # N=5 not divisible by 8 -> G falls back to 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pointnet_encode_fused_matches_flax():
    enc = PointNetFeat(out_dim=1024, global_feat=False, feature_transform=True,
                       return_parts=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 96, 3)).astype(np.float32) * 0.2)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    pf_ref, gf_ref = enc.apply({"params": params}, x)
    pf, gf = pointnet_encode_fused(params, x, feature_transform=True,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pf_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref), atol=2e-5)
