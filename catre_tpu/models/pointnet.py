"""Shared PointNet encoder (no BatchNorm), TPU-native layout.

Behavioral reference: `core/catre/models/pointnets/pointnet.py` (STN3d:13,
STNkd:44, PointNetfeat:82).  Re-designed points-last: clouds are (B, P, 3)
and every "Conv1d(k=1)" becomes a Dense over the channel (lane) axis, so the
whole encoder is a chain of (B*P, Cin)x(Cin, Cout) matmuls that XLA tiles
straight onto the MXU; the only cross-point ops are the max-pool reductions
and the (B,P,3)x(B,3,3) STN bmm.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .layers import TorchDense


class STN(nn.Module):
    """Spatial transformer: predicts a (k,k) transform added to identity.

    k=3 -> reference STN3d (`pointnet.py:13-41`); k=64 -> STNkd (`:44-78`).
    """

    k: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # x: (B, P, k)
        h = nn.relu(TorchDense(64, dtype=self.dtype, name="conv1")(x))
        h = nn.relu(TorchDense(128, dtype=self.dtype, name="conv2")(h))
        h = nn.relu(TorchDense(1024, dtype=self.dtype, name="conv3")(h))
        h = jnp.max(h, axis=1)  # (B, 1024)
        h = nn.relu(TorchDense(512, dtype=self.dtype, name="fc1")(h))
        h = nn.relu(TorchDense(256, dtype=self.dtype, name="fc2")(h))
        h = TorchDense(self.k * self.k, dtype=self.dtype, name="fc3")(h)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(1, self.k * self.k)
        return (h + iden).reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """PointNet feature encoder without BN.

    Config (shipped): num_points=1024, global_feat=False,
    feature_transform=True, out_dim=1024
    (`configs/catre/NOCS_REAL/...120e.py:76-82`).

    Input (B, P, 3); output (B, P, out_dim + 64) per-point features
    (global max-pooled feature broadcast-concatenated with the 64-d point
    features) when global_feat=False, else (B, out_dim).
    """

    out_dim: int = 1024
    global_feat: bool = False
    feature_transform: bool = True
    return_parts: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # x: (B, P, 3)
        trans = STN(k=3, dtype=self.dtype, name="stn")(x)
        # torch: x^T @ trans with x (B,3,P) -> points-last: x @ trans
        x = jnp.einsum("bpi,bij->bpj", x, trans)
        x = nn.relu(TorchDense(64, dtype=self.dtype, name="conv1")(x))

        if self.feature_transform:
            trans_feat = STN(k=64, dtype=self.dtype, name="fstn")(x)
            x = jnp.einsum("bpi,bij->bpj", x, trans_feat)

        pointfeat = x  # (B, P, 64)
        x = nn.relu(TorchDense(128, dtype=self.dtype, name="conv2")(x))
        x = nn.relu(TorchDense(512, dtype=self.dtype, name="conv3")(x))
        x = TorchDense(self.out_dim, dtype=self.dtype, name="conv4")(x)
        gfeat = jnp.max(x, axis=1)  # (B, out_dim)
        if self.global_feat:
            return gfeat
        if self.return_parts:
            # TPU-native factored form: the reference's per-point feature is
            # [global(out_dim) ⊕ point(64)] with the global part constant
            # across points — return the parts and let consumers exploit the
            # structure instead of materializing (B, P, out_dim+64).
            return pointfeat, gfeat
        g = jnp.broadcast_to(gfeat[:, None, :], (x.shape[0], x.shape[1], self.out_dim))
        # channel order matches torch cat([global, pointfeat], dim=1)
        return jnp.concatenate([g, pointfeat], axis=-1)  # (B, P, out_dim+64)
