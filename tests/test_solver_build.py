"""build_optimizer features: LR multipliers, frozen subtrees, grad clip."""

import numpy as np

import jax.numpy as jnp
import optax

from catre_tpu.solver import build_optimizer


def _params():
    return {
        "pcl_net": {"w": jnp.ones((2, 2))},
        "rot_head": {"w": jnp.ones((2, 2))},
        "ts_head": {"w": jnp.ones((2, 2))},
    }


def _grads():
    return {
        "pcl_net": {"w": jnp.full((2, 2), 0.1)},
        "rot_head": {"w": jnp.full((2, 2), 0.1)},
        "ts_head": {"w": jnp.full((2, 2), 0.1)},
    }


def test_frozen_subtree_gets_zero_update():
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "sgd", "lr": 1.0, "momentum": 0.0}},
                         frozen=("pcl_net",))
    params = _params()
    state = tx.init(params)
    updates, _ = tx.update(_grads(), state, params)
    np.testing.assert_allclose(np.asarray(updates["pcl_net"]["w"]), 0.0)
    assert float(jnp.abs(updates["rot_head"]["w"]).sum()) > 0


def test_lr_mult_scales_update():
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "sgd", "lr": 1.0, "momentum": 0.0}},
                         lr_mults={"rot_head": 0.5, "ts_head": 2.0})
    params = _params()
    state = tx.init(params)
    updates, _ = tx.update(_grads(), state, params)
    base = np.asarray(updates["pcl_net"]["w"])
    np.testing.assert_allclose(np.asarray(updates["rot_head"]["w"]), base * 0.5)
    np.testing.assert_allclose(np.asarray(updates["ts_head"]["w"]), base * 2.0)


def test_grad_clip_value():
    tx = build_optimizer({
        "OPTIMIZER_CFG": {"type": "sgd", "lr": 1.0, "momentum": 0.0},
        "CLIP_GRADIENTS": {"ENABLED": True, "CLIP_TYPE": "value", "CLIP_VALUE": 0.05},
    })
    params = _params()
    state = tx.init(params)
    updates, _ = tx.update(_grads(), state, params)
    # grads 0.1 clipped to 0.05, sgd lr 1 -> update -0.05
    np.testing.assert_allclose(np.asarray(updates["pcl_net"]["w"]), -0.05)


def test_injected_lr_overwrite():
    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 1e-4}})
    params = _params()
    state = tx.init(params)
    assert abs(float(state.hyperparams["learning_rate"]) - 1e-4) < 1e-9
    state = state._replace(hyperparams={**state.hyperparams,
                                        "learning_rate": jnp.asarray(5e-5)})
    updates, state2 = tx.update(_grads(), state, params)
    assert np.isfinite(np.asarray(updates["pcl_net"]["w"])).all()