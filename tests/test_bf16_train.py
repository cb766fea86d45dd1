"""bf16 compute (MODEL.BF16, the AMP analogue) must train without NaNs and
keep f32 parameters."""

import numpy as np

import jax
import jax.numpy as jnp

from catre_tpu.engine.train import InputNoiseConfig, TrainState, make_train_step
from catre_tpu.geom import axis_symmetry_rotation_bank
from catre_tpu.losses import LossConfig
from catre_tpu.models import CATREConfig, CATREDisRShared, init_params
from catre_tpu.solver import build_optimizer

from test_engine import _synthetic_batch


def test_bf16_train_step():
    cfg = CATREConfig(num_pcl=128, num_kps=128, dtype=jnp.bfloat16)
    model = CATREDisRShared(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    # parameters stay f32 (mixed precision)
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params))

    tx = build_optimizer({"OPTIMIZER_CFG": {"type": "Ranger", "lr": 1e-3}})
    state = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))
    noise = InputNoiseConfig(bbox3d_aug_prob=0.0, rt_aug_prob=0.0)
    sym_bank = axis_symmetry_rotation_bank(max_sym_disc_step=0.1)
    step = make_train_step(model, cfg, LossConfig(), noise, tx, sym_bank, n_iter=2)

    batch = _synthetic_batch()
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub, 1e-3)
        losses.append(float(jnp.mean(metrics["loss_total"])))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0]
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(state.params))
