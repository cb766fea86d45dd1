"""Shared layer utilities: torch-matching initializers, GroupNorm for
points-last layouts, exact GELU.

The reference heads use mmcv `normal_init(std=...)` (weight ~ N(0, std),
bias = 0) while the PointNet encoder keeps torch defaults
(kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias).  Matching these exactly keeps training dynamics and
checkpoint-parity tests honest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear / Conv1d(k=1) default weight init on a flax kernel.

    flax Dense kernel shape is (in, out); torch fan_in = in.
    kaiming_uniform_(a=sqrt(5)) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_kernel_init(std: float):
    """mmcv normal_init: weight ~ N(0, std)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class TorchDense(nn.Module):
    """Dense with torch-default initialization (used by the encoder)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_bias_init_for(in_features),
            dtype=self.dtype,
        )(x)


class HeadDense(nn.Module):
    """Dense with mmcv normal_init(std) + zero bias (used by the heads)."""

    features: int
    std: float = 0.001
    dtype: jnp.dtype | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=normal_kernel_init(self.std),
            bias_init=nn.initializers.zeros,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class GroupNormPointsLast(nn.Module):
    """GroupNorm matching torch GroupNorm(G, C) on a (B, C, P) tensor, for our
    points-last (B, P, C) layout: statistics over (P, C/G) per (B, group).

    Also accepts (B, C) inputs (spatial size 1), as the FC head uses.
    Stats are computed in float32 regardless of input dtype.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        G = self.num_groups
        assert C % G == 0, (C, G)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        if x.ndim == 2:  # (B, C)
            g = xf.reshape(x.shape[0], G, C // G)
            mean = g.mean(axis=2, keepdims=True)
            var = g.var(axis=2, keepdims=True)
            g = (g - mean) * jax.lax.rsqrt(var + self.epsilon)
            out = g.reshape(x.shape[0], C)
        else:  # (B, P, C)
            B, P = x.shape[0], x.shape[1]
            g = xf.reshape(B, P, G, C // G)
            mean = g.mean(axis=(1, 3), keepdims=True)
            var = g.var(axis=(1, 3), keepdims=True)
            g = (g - mean) * jax.lax.rsqrt(var + self.epsilon)
            out = g.reshape(B, P, C)
        out = out * scale + bias
        return out.astype(orig_dtype)


def gelu_exact(x):
    """torch nn.GELU() default = exact erf formulation (jax default is tanh
    approximation — do NOT use jax.nn.gelu without approximate=False)."""
    return jax.nn.gelu(x, approximate=False)
