"""Disentangled delta heads.

Behavioral reference: `core/catre/models/heads/conv_out_per_rot_head.py`
(ConvOutPerRotHead:10, RotHead:74) and `fc_trans_size_head.py`
(FC_TransSizeHead:9).  Points-last layout; the per-point "Conv1d(k=1)"
stacks are Dense-over-channels, and the reference's `conv_p` (a Conv1d over
the *point* dimension) becomes a learned weighted sum over points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import GroupNormPointsLast, HeadDense, gelu_exact


def _point_weight_init(key, shape, dtype=jnp.float32):
    """conv_p weight: mmcv normal_init(std=0.001) like the other head convs."""
    return 0.001 * jax.random.normal(key, shape, dtype)


class RotHead(nn.Module):
    """One per-axis rotation head: 2x(Dense->GN(32)->GELU) -> Dense(rot_dim)
    -> learned point-weighted sum (`conv_p`, ref `conv_out_per_rot_head.py:112`).

    Input (B, P, in_dim); output (B, rot_dim).
    All layers normal_init(std=0.001), zero bias (`:117-124`).
    """

    feat_dim: int = 256
    num_layers: int = 2
    rot_dim: int = 3
    num_gn_groups: int = 32
    num_points: int = 2048
    point_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = HeadDense(self.feat_dim, std=0.001, dtype=self.dtype, name=f"layer{i}")(x)
            x = GroupNormPointsLast(num_groups=self.num_gn_groups, name=f"gn{i}")(x)
            x = gelu_exact(x)
        x = HeadDense(self.rot_dim, std=0.001, dtype=self.dtype, name="neck")(x)  # (B, P, rot_dim)
        # conv_p: Conv1d(num_points -> 1, k=1): out[b,d] = sum_p w[p] x[b,p,d] + bias
        w = self.param("point_weight", _point_weight_init, (self.num_points,))
        out = jnp.einsum("bpd,p->bd", x, w.astype(x.dtype))
        if self.point_bias:
            b = self.param("point_bias_param", nn.initializers.zeros, (1,))
            out = out + b.astype(x.dtype)
        return out


class ConvOutPerRotHead(nn.Module):
    """Two independent RotHeads (x axis, y axis); outputs concatenated 6D.

    Ref `conv_out_per_rot_head.py:10-71`; shipped cfg in_dim=1088,
    num_points=2048, rot_dim=3 (`configs/...120e.py:87-100`).
    """

    feat_dim: int = 256
    num_layers: int = 2
    rot_dim: int = 3
    num_gn_groups: int = 32
    num_points: int = 2048
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        kw = dict(
            feat_dim=self.feat_dim,
            num_layers=self.num_layers,
            rot_dim=self.rot_dim,
            num_gn_groups=self.num_gn_groups,
            num_points=self.num_points,
            dtype=self.dtype,
        )
        rx = RotHead(**kw, name="rot_head_x")(x)
        ry = RotHead(**kw, name="rot_head_y")(x)
        return jnp.concatenate([rx, ry], axis=1)  # (B, 2*rot_dim)


class FCTransSizeHead(nn.Module):
    """Translation + size head on the pooled feature.

    2x(Dense->GN(32)->GELU) then fc_t / fc_s (normal_init std=0.01,
    ref `fc_trans_size_head.py:57-59`).  Input (B, in_dim); outputs
    ((B, 3), (B, 3)).
    """

    feat_dim: int = 256
    num_layers: int = 2
    num_gn_groups: int = 32
    num_classes: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = HeadDense(self.feat_dim, std=0.001, dtype=self.dtype, name=f"linear{i}")(x)
            x = GroupNormPointsLast(num_groups=self.num_gn_groups, name=f"gn{i}")(x)
            x = gelu_exact(x)
        trans = HeadDense(3 * self.num_classes, std=0.01, dtype=self.dtype, name="fc_t")(x)
        scale = HeadDense(3 * self.num_classes, std=0.01, dtype=self.dtype, name="fc_s")(x)
        return trans, scale
