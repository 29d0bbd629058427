"""Normalization zoo + dispatch.

Parity with `/root/reference/score_sde_pytorch/models/normalization.py:21-213`
in NHWC layout. Every shipped config uses plain GroupNorm; the plus /
variance / none variants and their class-conditional counterparts are the
rest of the reference zoo (its conditional dispatch only ever returns
ConditionalInstanceNorm2dPlus, `normalization.py:24-28`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _scale_bias_init(c_scale, c_bias):
    """Embedding rows: first c_scale entries ~ N(1, 0.02), rest zero
    (`normalization.py:92-97,186-191`)."""

    def init(key, shape, dtype=jnp.float32):
        n_cls, width = shape
        assert width == c_scale + c_bias, (shape, c_scale, c_bias)
        scale = 1.0 + 0.02 * nn.initializers.normal(1.0)(
            key, (n_cls, c_scale), dtype
        )
        return jnp.concatenate(
            [scale, jnp.zeros((n_cls, c_bias), dtype)], axis=-1
        )

    return init


def _instance_norm(x):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


def _plus_stats(x):
    """Normalized per-channel means (the '++' mean-reintroduction signal)."""
    means = jnp.mean(x, axis=(1, 2))  # (B, C)
    m = jnp.mean(means, axis=-1, keepdims=True)
    # torch.var defaults to the UNBIASED estimator (ddof=1)
    v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
    return (means - m) / jnp.sqrt(v + 1e-5)


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (NCSN, `normalization.py:155-182`): instance norm with
    mean-reintroduction, out = gamma * (h + means*alpha) + beta."""

    bias: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        c = x.shape[-1]
        means_norm = _plus_stats(x)
        h = _instance_norm(x)
        alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
        gamma = self.param("gamma", nn.initializers.normal(0.02), (c,)) + 1.0
        h = h + means_norm[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (c,))
        return out


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional InstanceNorm++ (`normalization.py:184-213`): the
    gamma/alpha/beta triple comes from a per-class embedding row."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):  # x: (B, H, W, C); y: (B,) int class labels
        c = x.shape[-1]
        means_norm = _plus_stats(x)
        h = _instance_norm(x)
        if self.bias:
            table = self.param(
                "embed", _scale_bias_init(2 * c, c), (self.num_classes, 3 * c)
            )
            row = table[y]  # (B, 3C)
            gamma, alpha, beta = row[:, :c], row[:, c:2 * c], row[:, 2 * c:]
        else:
            table = self.param(
                "embed", _scale_bias_init(2 * c, 0), (self.num_classes, 2 * c)
            )
            row = table[y]
            gamma, alpha, beta = row[:, :c], row[:, c:], None
        h = h + means_norm[:, None, None, :] * alpha[:, None, None, :]
        out = gamma[:, None, None, :] * h
        if beta is not None:
            out = out + beta[:, None, None, :]
        return out


class ConditionalInstanceNorm2d(nn.Module):
    """Class-conditional plain instance norm (`normalization.py:67-90`)."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        h = _instance_norm(x)
        width = 2 * c if self.bias else c
        table = self.param(
            "embed", _scale_bias_init(c, width - c), (self.num_classes, width)
        )
        row = table[y]
        out = row[:, None, None, :c] * h
        if self.bias:
            out = out + row[:, None, None, c:]
        return out


class VarianceNorm2d(nn.Module):
    """Variance-only normalization (`normalization.py:110-121`)."""

    bias: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # torch.var default is unbiased (normalization.py:118)
        v = jnp.var(x, axis=(1, 2), keepdims=True, ddof=1)
        h = x / jnp.sqrt(v + 1e-5)
        alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
        out = alpha * h
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (c,))
        return out


class ConditionalVarianceNorm2d(nn.Module):
    """Class-conditional variance norm (`normalization.py:93-107`)."""

    num_classes: int
    bias: bool = False

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        # torch.var default is unbiased (normalization.py:101)
        v = jnp.var(x, axis=(1, 2), keepdims=True, ddof=1)
        h = x / jnp.sqrt(v + 1e-5)
        table = self.param(
            "embed", _scale_bias_init(c, 0), (self.num_classes, c)
        )
        return table[y][:, None, None, :] * h


class NoneNorm2d(nn.Module):
    """Identity (`normalization.py:147-152`)."""

    @nn.compact
    def __call__(self, x):
        return x


class ConditionalNoneNorm2d(nn.Module):
    """Per-class affine without normalization (`normalization.py:124-144`)."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        width = 2 * c if self.bias else c
        table = self.param(
            "embed", _scale_bias_init(c, width - c), (self.num_classes, width)
        )
        row = table[y]
        out = row[:, None, None, :c] * x
        if self.bias:
            out = out + row[:, None, None, c:]
        return out


def get_normalization(name: str, conditional: bool = False, num_classes=None):
    """Dispatch by config name (`normalization.py:21-44`): the reference's
    conditional branch only implements InstanceNorm++."""
    name = name.lower()
    if conditional:
        if name == "instancenorm++":
            return lambda ch: ConditionalInstanceNorm2dPlus(
                num_classes=num_classes
            )
        raise NotImplementedError(f"{name} has no conditional variant")
    if name == "groupnorm":
        return lambda ch: nn.GroupNorm(num_groups=min(ch // 4, 32), epsilon=1e-6)
    if name == "instancenorm++":
        return lambda ch: InstanceNorm2dPlus()
    if name == "instancenorm":
        return lambda ch: nn.GroupNorm(num_groups=ch, epsilon=1e-5)
    if name == "variancenorm":
        return lambda ch: VarianceNorm2d()
    if name == "nonenorm":
        return lambda ch: NoneNorm2d()
    if name == "batchnorm":
        return lambda ch: nn.BatchNorm(use_running_average=True)
    raise ValueError(f"normalization {name} unknown")
