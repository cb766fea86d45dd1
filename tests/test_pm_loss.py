"""PM loss variants vs direct numpy implementations of the reference
formulas (`losses/pm_loss.py:110-194`)."""

import numpy as np

import jax.numpy as jnp

from catre_tpu.geom import axis_symmetry_rotation_bank
from catre_tpu.losses import pm_loss

RNG = np.random.default_rng(51)


def _rand_rot(b):
    a = RNG.normal(size=(b, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=1, axis2=2))
    q = q * d[:, None, :]
    q[np.linalg.det(q) < 0, :, 0] *= -1
    return q.astype(np.float32)


def _setup(b=5, n=32):
    return {
        "pred_rots": _rand_rot(b),
        "gt_rots": _rand_rot(b),
        "points": RNG.normal(size=(b, n, 3)).astype(np.float32) * 0.3,
        "pred_transes": RNG.normal(size=(b, 3)).astype(np.float32) * 0.1,
        "gt_transes": RNG.normal(size=(b, 3)).astype(np.float32) * 0.1,
        "pred_scales": RNG.uniform(0.1, 0.4, (b, 3)).astype(np.float32),
        "gt_scales": RNG.uniform(0.1, 0.4, (b, 3)).astype(np.float32),
    }


def _transform(points, R, scale=None):
    p = points * scale[:, None] if scale is not None else points
    return np.einsum("bij,bpj->bpi", R, p)


def test_r_only_with_scale():
    d = _setup()
    out = pm_loss(
        **{k: jnp.asarray(v) for k, v in d.items()},
        symmetric=False, r_only=True, with_scale=True, loss_type="l1",
    )
    est = _transform(d["points"], d["pred_rots"], d["pred_scales"])
    tgt = _transform(d["points"], d["gt_rots"], d["gt_scales"])
    ref = 3 * np.abs(est - tgt).mean()
    assert abs(float(out["loss_PM_R"]) - ref) < 1e-5


def test_disentangle_t_with_points():
    d = _setup()
    out = pm_loss(
        **{k: jnp.asarray(v) for k, v in d.items()},
        symmetric=False, r_only=False, with_scale=True,
        disentangle_t=True, t_loss_use_points=True,
    )
    est = _transform(d["points"], d["pred_rots"], d["pred_scales"])
    tgt = _transform(d["points"], d["gt_rots"], d["gt_scales"])
    tgt_RT = tgt + d["gt_transes"][:, None]
    est_R = est + d["gt_transes"][:, None]
    est_T = tgt + d["pred_transes"][:, None]
    assert abs(float(out["loss_PM_R"]) - 3 * np.abs(est_R - tgt_RT).mean()) < 1e-5
    assert abs(float(out["loss_PM_T"]) - 3 * np.abs(est_T - tgt_RT).mean()) < 1e-5


def test_disentangle_z_no_points():
    d = _setup()
    out = pm_loss(
        **{k: jnp.asarray(v) for k, v in d.items()},
        symmetric=False, r_only=False, with_scale=False,
        disentangle_z=True, disentangle_t=True, t_loss_use_points=False,
    )
    est = _transform(d["points"], d["pred_rots"])
    tgt = _transform(d["points"], d["gt_rots"])
    assert abs(float(out["loss_PM_R"]) - 3 * np.abs(est - tgt).mean()) < 1e-5
    assert abs(float(out["loss_PM_xy_noP"]) -
               np.abs(d["pred_transes"][:, :2] - d["gt_transes"][:, :2]).mean()) < 1e-6
    assert abs(float(out["loss_PM_z_noP"]) -
               np.abs(d["pred_transes"][:, 2] - d["gt_transes"][:, 2]).mean()) < 1e-6


def test_entangled_rt():
    d = _setup()
    out = pm_loss(
        **{k: jnp.asarray(v) for k, v in d.items()},
        symmetric=False, r_only=False, with_scale=True,
        disentangle_t=False, disentangle_z=False,
    )
    est = _transform(d["points"], d["pred_rots"], d["pred_scales"]) + d["pred_transes"][:, None]
    tgt = _transform(d["points"], d["gt_rots"], d["gt_scales"]) + d["gt_transes"][:, None]
    assert abs(float(out["loss_PM_RT"]) - 3 * np.abs(est - tgt).mean()) < 1e-5


def test_symmetric_reduces_loss():
    d = _setup()
    bank = jnp.asarray(axis_symmetry_rotation_bank(max_sym_disc_step=0.01))
    sym = jnp.ones(5, dtype=bool)
    kw = {k: jnp.asarray(v) for k, v in d.items()}
    no_sym = pm_loss(**kw, symmetric=False, r_only=True, with_scale=True)
    with_sym = pm_loss(**kw, symmetric=True, sym_flags=sym, sym_bank=bank,
                       r_only=True, with_scale=True)
    assert float(with_sym["loss_PM_R"]) <= float(no_sym["loss_PM_R"]) + 1e-6
