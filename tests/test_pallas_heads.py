"""Fused rot-head Pallas kernel vs the flax reference (interpreter mode on
CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.models.heads import ConvOutPerRotHead
from catre_tpu.ops.pallas_heads import fused_conv_per_rot_head

RNG = np.random.default_rng(31)


def test_fused_rot_head_matches_flax():
    B, P, K = 3, 96, 64
    pf = jnp.asarray(RNG.normal(size=(B, P + K, 64)).astype(np.float32) * 0.5)
    g_pcl = jnp.asarray(RNG.normal(size=(B, 1024)).astype(np.float32) * 0.5)
    g_kps = jnp.asarray(RNG.normal(size=(B, 1024)).astype(np.float32) * 0.5)

    head = ConvOutPerRotHead(num_points=P + K)
    params = head.init(jax.random.PRNGKey(0), pf, g_pcl, g_kps, P)["params"]
    # give the head nontrivial weights (init is ~1e-3; scale up for signal)
    params = jax.tree_util.tree_map(lambda x: x * 50.0 if x.ndim >= 1 else x, params)

    ref = head.apply({"params": params}, pf, g_pcl, g_kps, P)
    fused = fused_conv_per_rot_head(pf, g_pcl, g_kps, params, n_pcl=P, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-4)


def test_fused_rot_head_split_position_matters():
    """Different n_pcl must change the result (g term routing)."""
    B, P, K = 2, 32, 32
    pf = jnp.asarray(RNG.normal(size=(B, P + K, 64)).astype(np.float32))
    g_pcl = jnp.asarray(RNG.normal(size=(B, 1024)).astype(np.float32))
    g_kps = jnp.asarray(RNG.normal(size=(B, 1024)).astype(np.float32))
    head = ConvOutPerRotHead(num_points=P + K)
    params = head.init(jax.random.PRNGKey(1), pf, g_pcl, g_kps, P)["params"]
    params = jax.tree_util.tree_map(lambda x: x * 50.0 if x.ndim >= 1 else x, params)

    a = fused_conv_per_rot_head(pf, g_pcl, g_kps, params, n_pcl=P, interpret=True)
    b = fused_conv_per_rot_head(pf, g_pcl, g_kps, params, n_pcl=P + K, interpret=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_poly_gelu_matches_exact():
    """The FMA-only polynomial GELU must match exact erf-GELU to ~5e-6
    everywhere that matters (GN outputs are a few sigma; tails saturate)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from catre_tpu.ops.pallas_heads import _gelu_exact

    x = jnp.asarray(np.linspace(-30, 30, 200001, dtype=np.float32))
    ours = np.asarray(_gelu_exact(x))
    exact = np.asarray(jax.nn.gelu(x, approximate=False))
    np.testing.assert_allclose(ours, exact, atol=6e-6)


def test_fast_gelu_accuracy():
    """tanh-form inference GELU: |err| <= 3e-5 everywhere."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from catre_tpu.ops.pallas_heads import _gelu_fast

    x = jnp.asarray(np.linspace(-40, 40, 400001, dtype=np.float32))
    ours = np.asarray(_gelu_fast(x))
    exact = np.asarray(jax.nn.gelu(x, approximate=False))
    np.testing.assert_allclose(ours, exact, atol=3e-5)


def test_grouped_kernel_matches_per_object():
    """group=2/4 grouped grid must match the per-object kernel exactly
    (f32 interpreter)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from catre_tpu.models import CATREConfig, CATREDisRShared, init_params
    from catre_tpu.ops.pallas_heads import fused_conv_per_rot_head

    cfg = CATREConfig(num_pcl=64, num_kps=64)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    rp = params["rot_head"]

    rng = np.random.default_rng(0)
    B, P = 8, cfg.num_pcl + cfg.num_kps
    pf = jnp.asarray(rng.normal(size=(B, P, 64)).astype(np.float32))
    g1 = jnp.asarray(rng.normal(size=(B, 1024)).astype(np.float32))
    g2 = jnp.asarray(rng.normal(size=(B, 1024)).astype(np.float32))

    ref = fused_conv_per_rot_head(pf, g1, g2, rp, n_pcl=cfg.num_pcl,
                                  interpret=True)
    for G in (2, 4):
        out = fused_conv_per_rot_head(pf, g1, g2, rp, n_pcl=cfg.num_pcl,
                                      interpret=True, group=G)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=f"group={G}")
