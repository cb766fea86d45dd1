"""Golden parity: optax ranger2020 / ranger_adabelief / badam / ranger21 vs
the imported reference torch implementations, plus the d2 scheduler family
(WarmupMultiStepLR / WarmupCosineLR)."""

import os.path as osp
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp
import optax

from catre_tpu.solver.build import build_optimizer
from catre_tpu.solver.ranger_family import badam, ranger2020, ranger21, ranger_adabelief
from catre_tpu.solver.schedule import build_lr_fn

if not osp.isdir("/root/reference/lib"):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
sys.path.insert(0, "/root/reference")

N_STEPS = 15  # crosses lookahead (k=6 / mergetime=5) and RAdam rectification


def _fixtures(seed, shape_w=(8, 16), shape_b=(16,)):
    rng = np.random.default_rng(seed)
    w0 = rng.normal(size=shape_w).astype(np.float32)
    b0 = rng.normal(size=shape_b).astype(np.float32)
    gw = [rng.normal(size=shape_w).astype(np.float32) for _ in range(N_STEPS)]
    gb = [rng.normal(size=shape_b).astype(np.float32) for _ in range(N_STEPS)]
    return w0, b0, gw, gb


def _run_torch(opt_cls, w0, b0, gw, gb, **kw):
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = opt_cls([wt, bt], **kw)
    for i in range(N_STEPS):
        wt.grad = torch.from_numpy(gw[i].copy())
        bt.grad = torch.from_numpy(gb[i].copy())
        opt.step()
    return wt.detach().numpy(), bt.detach().numpy()


def _run_optax(tx, w0, b0, gw, gb):
    # torch (out, in) layout -> flax (in, out): transpose 2-D tensors
    params = {"l": {"kernel": jnp.asarray(w0.T), "bias": jnp.asarray(b0)}}
    state = tx.init(params)
    for i in range(N_STEPS):
        g = {"l": {"kernel": jnp.asarray(gw[i].T), "bias": jnp.asarray(gb[i])}}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params["l"]["kernel"]).T, np.asarray(params["l"]["bias"])


def test_ranger2020_trajectory():
    from lib.torch_utils.solver.ranger2020 import Ranger as Ref

    w0, b0, gw, gb = _fixtures(11)
    wt, bt = _run_torch(Ref, w0, b0, gw, gb, lr=1e-2, weight_decay=0.01)
    wj, bj = _run_optax(ranger2020(1e-2, weight_decay=0.01), w0, b0, gw, gb)
    np.testing.assert_allclose(wj, wt, atol=2e-5)
    np.testing.assert_allclose(bj, bt, atol=2e-5)


def test_ranger2020_gc_on_generalized_gradient():
    """gc_loc=False centralizes the generalized gradient instead of the raw
    one (`ranger2020.py:245-250`)."""
    from lib.torch_utils.solver.ranger2020 import Ranger as Ref

    w0, b0, gw, gb = _fixtures(12)
    wt, bt = _run_torch(Ref, w0, b0, gw, gb, lr=1e-2, gc_loc=False)
    wj, bj = _run_optax(ranger2020(1e-2, gc_loc=False), w0, b0, gw, gb)
    np.testing.assert_allclose(wj, wt, atol=2e-5)
    np.testing.assert_allclose(bj, bt, atol=2e-5)


def test_ranger_adabelief_trajectory():
    from lib.torch_utils.solver.ranger_adabelief import RangerAdaBelief as Ref

    w0, b0, gw, gb = _fixtures(13)
    wt, bt = _run_torch(Ref, w0, b0, gw, gb, lr=1e-2, weight_decay=0.01)
    wj, bj = _run_optax(ranger_adabelief(1e-2, weight_decay=0.01), w0, b0, gw, gb)
    np.testing.assert_allclose(wj, wt, atol=2e-5)
    np.testing.assert_allclose(bj, bt, atol=2e-5)


def test_ranger_adabelief_coupled_decay():
    """weight_decouple=False adds wd*p to the RAW grad before GC
    (`ranger_adabelief.py:144-146`)."""
    from lib.torch_utils.solver.ranger_adabelief import RangerAdaBelief as Ref

    w0, b0, gw, gb = _fixtures(14)
    wt, bt = _run_torch(Ref, w0, b0, gw, gb, lr=1e-2, weight_decay=0.05,
                        weight_decouple=False)
    wj, bj = _run_optax(
        ranger_adabelief(1e-2, weight_decay=0.05, weight_decouple=False),
        w0, b0, gw, gb)
    np.testing.assert_allclose(wj, wt, atol=2e-5)
    np.testing.assert_allclose(bj, bt, atol=2e-5)


def test_badam_trajectory():
    from lib.torch_utils.solver.badam import BAdam as Ref

    w0, b0, gw, gb = _fixtures(15)
    wt, bt = _run_torch(Ref, w0, b0, gw, gb, lr=1e-2, weight_decay=1e-2)
    wj, bj = _run_optax(badam(1e-2, weight_decay=1e-2), w0, b0, gw, gb)
    np.testing.assert_allclose(wj, wt, atol=2e-5)
    np.testing.assert_allclose(bj, bt, atol=2e-5)


def test_ranger21_trajectory():
    """Core Ranger21 path (AGC + GC + grad-norm + pnm AdamW + softplus denom
    + lookahead). weight_decay=0 and normloss off: the reference's phase-2
    stable-decay/norm-loss lines apply to a stale loop variable
    (`ranger21.py:455-476`) and are no-ops in this configuration, which pins
    the well-defined core bitwise."""
    from lib.torch_utils.solver.ranger21 import Ranger21 as Ref

    w0, b0, gw, gb = _fixtures(16)
    wt, bt = _run_torch(Ref, w0, b0, gw, gb, lr=1e-2, weight_decay=0.0,
                        normloss_active=False, logging_active=False)
    wj, bj = _run_optax(
        ranger21(1e-2, weight_decay=0.0, normloss_active=False), w0, b0, gw, gb)
    np.testing.assert_allclose(wj, wt, atol=3e-5)
    np.testing.assert_allclose(bj, bt, atol=3e-5)


def test_ranger21_decay_and_normloss_finite():
    """The corrected per-parameter stable decay + norm loss shrink weights
    and stay finite (the reference's own path is the documented bug)."""
    w0, b0, gw, gb = _fixtures(17)
    wj, bj = _run_optax(ranger21(1e-2, weight_decay=1e-2, normloss_active=True),
                        w0, b0, gw, gb)
    wj0, bj0 = _run_optax(ranger21(1e-2, weight_decay=0.0, normloss_active=False),
                          w0, b0, gw, gb)
    assert np.isfinite(wj).all() and np.isfinite(bj).all()
    assert not np.allclose(wj, wj0)  # decay actually does something


def test_registry_builds_all():
    # NOTE: a non-degenerate gradient — a constant one centralizes to zero,
    # which legitimately zeroes ranger21's stable-decay variance (the
    # reference divides by it unguarded too, `ranger21.py:445-461`)
    rng = np.random.default_rng(0)
    params = {"pcl_net": {"kernel": jnp.ones((4, 3))}}
    g = {"pcl_net": {"kernel": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))}}
    for typ in ["ranger2020", "ranger_adabelief", "badam", "ranger21"]:
        tx = build_optimizer({"OPTIMIZER_CFG": {"type": typ, "lr": 1e-3}})
        state = tx.init(params)
        upd, _ = tx.update(g, state, params)
        assert np.isfinite(np.asarray(upd["pcl_net"]["kernel"])).all(), typ


# ---------------------------------------------------------------- schedulers
def test_warmup_multistep_lr():
    """d2 WarmupMultiStepLR semantics (fvcore MultiStepParamScheduler +
    WarmupParamScheduler), hand-derived: values gamma^k after each relative
    milestone, linear warmup from warmup_factor."""
    total = 900
    cfg = {"LR_SCHEDULER_NAME": "WarmupMultiStepLR", "BASE_LR": 1.0,
           "REL_STEPS": (2.0 / 3.0, 8.0 / 9.0), "GAMMA": 0.1,
           "WARMUP_ITERS": 90, "WARMUP_FACTOR": 0.001,
           "WARMUP_METHOD": "linear"}
    lr = build_lr_fn(cfg, total)
    # warmup: linear from 0.001*sched(0)=0.001 to sched(0.1)=1.0
    assert lr(0) == pytest.approx(0.001)
    assert lr(45) == pytest.approx(0.001 + (1.0 - 0.001) * 0.5, rel=1e-9)
    # flat at 1.0 after warmup, before the first milestone (600)
    assert lr(120) == pytest.approx(1.0)
    assert lr(599) == pytest.approx(1.0)
    # after milestone 1 (2/3*900=600): gamma^1; after milestone 2 (800): gamma^2
    assert lr(601) == pytest.approx(0.1)
    assert lr(799) == pytest.approx(0.1)
    assert lr(801) == pytest.approx(0.01)
    # boundary: where*num_updates == milestone -> bisect_right puts it AFTER
    assert lr(600) == pytest.approx(0.1)
    assert lr(800) == pytest.approx(0.01)


def test_warmup_multistep_ignores_oversized_rel_steps():
    """REL_STEPS entries > 1 are dropped (ref `solver_utils.py:169-172`)."""
    cfg = {"LR_SCHEDULER_NAME": "WarmupMultiStepLR", "BASE_LR": 1.0,
           "REL_STEPS": (0.5, 1.5), "GAMMA": 0.1, "WARMUP_ITERS": 0}
    lr = build_lr_fn(cfg, 100)
    assert lr(99) == pytest.approx(0.1)  # only one active milestone


def test_warmup_cosine_lr():
    total = 1000
    cfg = {"LR_SCHEDULER_NAME": "WarmupCosineLR", "BASE_LR": 2.0,
           "WARMUP_ITERS": 100, "WARMUP_FACTOR": 0.01,
           "WARMUP_METHOD": "linear"}
    lr = build_lr_fn(cfg, total)
    import math

    sched = lambda w: 0.5 * (1 + math.cos(math.pi * w))
    # warmup interpolates from 0.01*sched(0)=0.01 toward sched(0.1)
    assert lr(0) == pytest.approx(2.0 * 0.01)
    end = sched(0.1)
    assert lr(50) == pytest.approx(2.0 * (0.01 + (end - 0.01) * 0.5), rel=1e-9)
    # beyond warmup: plain cosine at the global position ("fixed" scaling)
    assert lr(500) == pytest.approx(2.0 * sched(0.5), rel=1e-9)
    assert lr(999) == pytest.approx(2.0 * sched(0.999), rel=1e-9)


def test_unknown_scheduler_raises():
    with pytest.raises(ValueError):
        build_lr_fn({"LR_SCHEDULER_NAME": "Nope"}, 10)
