"""Golden tests: our rotation-loss kernels vs the ACTUAL reference module
(`core/catre/losses/rot_loss.py`, importable standalone — unlike pm_loss,
whose import chain needs numba/transforms3d; pm_loss parity is covered by
the in-repo torch mirror in tests/test_pm_loss.py)."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
from core.catre.losses import rot_loss as ref_rl  # noqa: E402

from catre_tpu.losses.catre_loss import angular_distance_rot  # noqa: E402

RNG = np.random.default_rng(5)


def _rand_rot(b):
    a = RNG.normal(size=(b, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=1, axis2=2))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


def test_angular_distance_rot_matches_reference():
    m1, m2 = _rand_rot(64), _rand_rot(64)
    ours = np.asarray(angular_distance_rot(jnp.asarray(m1), jnp.asarray(m2)))
    ref = ref_rl.angular_distance_rot(
        torch.from_numpy(m1), torch.from_numpy(m2), reduction="none").numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # mean reduction path (the reference default)
    ref_mean = float(ref_rl.angular_distance(torch.from_numpy(m1),
                                             torch.from_numpy(m2)))
    np.testing.assert_allclose(float(ours.mean()), ref_mean, atol=1e-6)


def test_rot_l2_matches_reference():
    m1, m2 = _rand_rot(32), _rand_rot(32)
    ref = float(ref_rl.rot_l2_loss(torch.from_numpy(m1), torch.from_numpy(m2)))
    ours = float(np.mean(np.square(m1 - m2)))
    np.testing.assert_allclose(ours, ref, atol=1e-7)
