"""Blocked fused rot head vs the flax reference (interpreter mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.models.heads import ConvOutPerRotHead
from catre_tpu.ops.pallas_heads_blocked import fused_conv_per_rot_head_blocked

RNG = np.random.default_rng(61)


def test_blocked_rot_head_matches_flax():
    B, P, K = 4, 64, 32
    pf = jnp.asarray(RNG.normal(size=(B, P + K, 64)).astype(np.float32) * 0.5)
    g_pcl = jnp.asarray(RNG.normal(size=(B, 1024)).astype(np.float32) * 0.5)
    g_kps = jnp.asarray(RNG.normal(size=(B, 1024)).astype(np.float32) * 0.5)

    head = ConvOutPerRotHead(num_points=P + K)
    params = head.init(jax.random.PRNGKey(0), pf, g_pcl, g_kps, P)["params"]
    params = jax.tree_util.tree_map(lambda x: x * 50.0 if x.ndim >= 1 else x, params)

    ref = head.apply({"params": params}, pf, g_pcl, g_kps, P)
    for G in (2, 4):
        got = fused_conv_per_rot_head_blocked(
            pf, g_pcl, g_kps, params, n_pcl=P, block_size=G, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)
