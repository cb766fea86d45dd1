"""Fused PointNet column kernels vs the flax encoder (interpreter mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.models.pointnet import STN, PointNetFeat
from catre_tpu.ops.pallas_encoder import chain3_max, pointnet_forward_fused, stn_forward_fused

RNG = np.random.default_rng(41)


def test_chain3_max_matches_reference():
    B, P = 3, 64
    x = jnp.asarray(RNG.normal(size=(B, P, 16)).astype(np.float32))
    ws = [
        (jnp.asarray(RNG.normal(size=(16, 32)).astype(np.float32) * 0.2),
         jnp.asarray(RNG.normal(size=(32,)).astype(np.float32) * 0.1)),
        (jnp.asarray(RNG.normal(size=(32, 24)).astype(np.float32) * 0.2),
         jnp.asarray(RNG.normal(size=(24,)).astype(np.float32) * 0.1)),
        (jnp.asarray(RNG.normal(size=(24, 48)).astype(np.float32) * 0.2),
         jnp.asarray(RNG.normal(size=(48,)).astype(np.float32) * 0.1)),
    ]

    def ref(x, relu_last):
        h = jax.nn.relu(x @ ws[0][0] + ws[0][1])
        h = jax.nn.relu(h @ ws[1][0] + ws[1][1])
        h = h @ ws[2][0] + ws[2][1]
        if relu_last:
            h = jax.nn.relu(h)
        return jnp.max(h, axis=1)

    for relu_last in (False, True):
        got = chain3_max(x, ws[0][0], ws[0][1], ws[1][0], ws[1][1], ws[2][0], ws[2][1],
                         relu_last=relu_last, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, relu_last)), atol=1e-5)


def test_stn_fused_matches_flax():
    B, P = 2, 48
    x = jnp.asarray(RNG.normal(size=(B, P, 3)).astype(np.float32))
    stn = STN(k=3)
    params = stn.init(jax.random.PRNGKey(0), x)["params"]
    ref = stn.apply({"params": params}, x)
    got = stn_forward_fused(params, x, k=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pointnet_fused_matches_flax():
    B, P = 2, 48
    x = jnp.asarray(RNG.normal(size=(B, P, 3)).astype(np.float32) * 0.3)
    enc = PointNetFeat(return_parts=True)
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    pf_ref, g_ref = enc.apply({"params": params}, x)
    pf, g = pointnet_forward_fused(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pf_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)
