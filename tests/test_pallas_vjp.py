"""Custom-VJP fused rot head: gradients must match autodiff of the flax head
(interpreter mode, f32)."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.models.heads import ConvOutPerRotHead
from catre_tpu.ops.pallas_heads_vjp import fused_rot_head_train

RNG = np.random.default_rng(91)


def test_vjp_matches_autodiff():
    B, P, K = 3, 64, 32
    pf = jnp.asarray(RNG.normal(size=(B, P + K, 64)).astype(np.float32) * 0.5)
    g_pcl = jnp.asarray(RNG.normal(size=(B, 1024)).astype(np.float32) * 0.5)
    g_kps = jnp.asarray(RNG.normal(size=(B, 1024)).astype(np.float32) * 0.5)

    head = ConvOutPerRotHead(num_points=P + K)
    params = head.init(jax.random.PRNGKey(0), pf, g_pcl, g_kps, P)["params"]
    params = jax.tree_util.tree_map(lambda x: x * 50.0 if x.ndim >= 1 else x, params)

    cot = jnp.asarray(RNG.normal(size=(B, 6)).astype(np.float32))

    def loss_ref(p, pf_, gp, gk):
        out = head.apply({"params": p}, pf_, gp, gk, P)
        return jnp.sum(out * cot)

    def loss_fused(p, pf_, gp, gk):
        out = fused_rot_head_train(pf_, gp, gk, p, P, True)
        return jnp.sum(out * cot)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        params, pf, g_pcl, g_kps)
    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        params, pf, g_pcl, g_kps)

    assert abs(float(v_ref) - float(v_f)) < 1e-3

    # input grads
    for i, name in [(1, "pf"), (2, "g_pcl"), (3, "g_kps")]:
        np.testing.assert_allclose(np.asarray(g_f[i]), np.asarray(g_ref[i]),
                                   atol=5e-4, err_msg=name)

    # parameter grads (whole tree)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref[0])[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f[0])[0]
    assert len(flat_ref) == len(flat_f)
    for (p_ref, v_r), (p_f, v_fd) in zip(flat_ref, flat_f):
        assert jax.tree_util.keystr(p_ref) == jax.tree_util.keystr(p_f)
        np.testing.assert_allclose(
            np.asarray(v_fd), np.asarray(v_r), atol=5e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(p_ref),
        )
