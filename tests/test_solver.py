"""Parity tests: optax Ranger vs the reference torch Ranger; flat_and_anneal
schedule vs the reference closure. Skipped when the reference checkout is
not mounted."""

import os.path as osp
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from catre_tpu.solver import flat_and_anneal_factor, ranger

# reference optimizer/scheduler imported for golden values only
if not osp.isdir("/root/reference/lib"):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
sys.path.insert(0, "/root/reference")


def _torch_mlp(seed=0):
    torch.manual_seed(seed)
    return torch.nn.Sequential(
        torch.nn.Linear(8, 16), torch.nn.Tanh(), torch.nn.Linear(16, 4)
    )


def _flax_params_from(mlp):
    return {
        "l0": {
            "kernel": jnp.asarray(mlp[0].weight.detach().numpy().T),
            "bias": jnp.asarray(mlp[0].bias.detach().numpy()),
        },
        "l1": {
            "kernel": jnp.asarray(mlp[2].weight.detach().numpy().T),
            "bias": jnp.asarray(mlp[2].bias.detach().numpy()),
        },
    }


def _jax_forward(params, x):
    h = jnp.tanh(x @ params["l0"]["kernel"] + params["l0"]["bias"])
    return h @ params["l1"]["kernel"] + params["l1"]["bias"]


def test_ranger_matches_reference_trajectory():
    """Feed IDENTICAL precomputed gradient sequences to both optimizers so the
    comparison isolates optimizer math from model fp32 chaos."""
    from lib.torch_utils.solver.ranger import Ranger as RefRanger

    rng = np.random.default_rng(1)
    n_steps = 15  # crosses the k=6 lookahead boundary twice and the
    # N_sma rectification threshold (N_sma > 5 from step ~5)
    w0 = rng.normal(size=(8, 16)).astype(np.float32)  # torch layout (out=8? no: generic)
    b0 = rng.normal(size=(16,)).astype(np.float32)
    grads_w = [rng.normal(size=(8, 16)).astype(np.float32) for _ in range(n_steps)]
    grads_b = [rng.normal(size=(16,)).astype(np.float32) for _ in range(n_steps)]

    # torch side: weight param ndim 2 -> gets GC over dim 1..; torch treats
    # dim 0 as output. Our flax mirror must then be the TRANSPOSE.
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt_t = RefRanger([wt, bt], lr=1e-2, weight_decay=0.01)
    for i in range(n_steps):
        wt.grad = torch.from_numpy(grads_w[i].copy())
        bt.grad = torch.from_numpy(grads_b[i].copy())
        opt_t.step()

    import optax

    params = {"l": {"kernel": jnp.asarray(w0.T), "bias": jnp.asarray(b0)}}
    tx = ranger(learning_rate=1e-2, weight_decay=0.01)
    state = tx.init(params)
    for i in range(n_steps):
        g = {"l": {"kernel": jnp.asarray(grads_w[i].T), "bias": jnp.asarray(grads_b[i])}}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)

    # torch computes the RAdam rectification scalars in python float64 while
    # the jit'd version keeps them in fp32 -> ~6e-6 drift after 15 steps.
    np.testing.assert_allclose(
        np.asarray(params["l"]["kernel"]).T, wt.detach().numpy(), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(params["l"]["bias"]), bt.detach().numpy(), atol=2e-5)


def test_ranger_point_weight_gc():
    """point_weight (flat P-vector <- torch Conv1d (1,P,1)) must be
    centralized over all elements, unlike generic 1-D params."""
    from lib.torch_utils.solver.ranger import Ranger as RefRanger

    rng = np.random.default_rng(3)
    n_steps = 8
    P = 32
    w0 = rng.normal(size=(1, P, 1)).astype(np.float32)
    grads = [rng.normal(size=(1, P, 1)).astype(np.float32) for _ in range(n_steps)]

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = RefRanger([wt], lr=1e-2)
    for i in range(n_steps):
        wt.grad = torch.from_numpy(grads[i].copy())
        opt_t.step()

    import optax

    params = {"head": {"point_weight": jnp.asarray(w0[0, :, 0])}}
    tx = ranger(learning_rate=1e-2)
    state = tx.init(params)
    for i in range(n_steps):
        g = {"head": {"point_weight": jnp.asarray(grads[i][0, :, 0])}}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["head"]["point_weight"]), wt.detach().numpy()[0, :, 0], atol=2e-5
    )


def test_flat_and_anneal_matches_reference():
    from lib.torch_utils.solver.lr_scheduler import flat_and_anneal_lr_scheduler

    dummy = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(dummy.parameters(), lr=1.0)
    total = 1000
    _, f = flat_and_anneal_lr_scheduler(
        opt,
        total_iters=total,
        warmup_iters=100,
        warmup_factor=0.001,
        warmup_method="linear",
        anneal_point=0.72,
        anneal_method="cosine",
        return_function=True,
    )
    for x in [0, 1, 50, 99, 100, 500, 719, 720, 721, 850, 999, 1000, 1500]:
        ours = flat_and_anneal_factor(
            x, total_iters=total, warmup_iters=100, warmup_factor=0.001,
            warmup_method="linear", anneal_point=0.72, anneal_method="cosine",
        )
        assert abs(ours - f(x)) < 1e-9, (x, ours, f(x))


def test_flat_and_anneal_step_method():
    from lib.torch_utils.solver.lr_scheduler import flat_and_anneal_lr_scheduler

    dummy = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(dummy.parameters(), lr=1.0)
    total = 900
    _, f = flat_and_anneal_lr_scheduler(
        opt, total_iters=total, warmup_iters=90, warmup_factor=0.01,
        anneal_method="step", steps=[2 / 3.0, 8 / 9.0], step_gamma=0.1,
        return_function=True,
    )
    for x in [0, 89, 90, 400, 600, 601, 799, 800, 801, 899]:
        ours = flat_and_anneal_factor(
            x, total_iters=total, warmup_iters=90, warmup_factor=0.01,
            anneal_method="step", steps=(2 / 3.0, 8 / 9.0), step_gamma=0.1,
        )
        assert abs(ours - f(x)) < 1e-9, (x, ours, f(x))
