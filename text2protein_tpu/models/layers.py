"""Core score-network layers (Flax linen, NHWC layout).

Functional re-design of `/root/reference/score_sde_pytorch/models/layers.py`:
same math (DDPM variance-scaling init, sinusoidal time embedding, BigGAN
resblocks with in-block naive resampling, skip_rescale /sqrt(2)), laid out
NHWC so convs and the channel-last Dense ("NIN") ops tile directly onto the
TPU MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


def default_init(scale: float = 1.0):
    """DDPM initialization: fan_avg uniform variance scaling
    (`/root/reference/score_sde_pytorch/models/layers.py:44-80`)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def get_act(name: str):
    name = name.lower()
    if name == "elu":
        return nn.elu
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "swish":
        return nn.silu
    raise NotImplementedError(f"activation {name} does not exist")


def get_timestep_embedding(timesteps, embedding_dim, max_positions=10000):
    """Sinusoidal embedding, [sin | cos] order
    (`/root/reference/score_sde_pytorch/models/layers.py:97-111`)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def conv3x3(out_ch, init_scale=1.0, stride=1, name=None, dtype=None):
    return nn.Conv(
        out_ch,
        (3, 3),
        strides=(stride, stride),
        padding="SAME",
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


def conv1x1(out_ch, init_scale=1.0, name=None, dtype=None):
    return nn.Conv(
        out_ch,
        (1, 1),
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


def nin(out_dim, init_scale=0.1, name=None, dtype=None):
    """1x1 channel projection — in NHWC this is exactly a Dense over the last
    axis (the reference's einsum NIN, `layers.py:128-137`)."""
    return nn.Dense(
        out_dim,
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class GroupNormF32Stats(nn.Module):
    """GroupNorm with float32 statistics and selectable I/O precision.

    Activations dominate HBM bandwidth at N=128; flax GroupNorm(dtype=f32)
    materializes an f32 output (2x write+read traffic in a bf16 network),
    while GroupNorm(dtype=bf16) computes mean/variance in bf16 (measurably
    degraded sampling quality over 1000-step trajectories). Here the
    reductions ALWAYS upcast to f32 inside the fusion (no f32 buffer), and
    `follow_input_dtype` keeps the normalize/affine path in the input dtype —
    bf16 traffic, f32 statistics; ~+11% sampler throughput. With
    follow_input_dtype=False the whole op runs in f32 (reference-faithful).
    Param names/shapes match flax GroupNorm (checkpoint compatible), and
    both modes share this class so parameter paths are identical.
    """

    num_groups: int
    epsilon: float = 1e-6
    follow_input_dtype: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        cg = c // g
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        apply_dtype = x.dtype if self.follow_input_dtype else jnp.float32

        xg = x.reshape(x.shape[:-1] + (g, cg))
        xf = xg.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        # fast variance: one fused read pass computes both moments in f32
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        mean2 = jnp.mean(xf * xf, axis=axes, keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)

        # normalize in the grouped shape so the (…, g, 1) statistics
        # broadcast without materializing full-size tensors
        y = (xg.astype(apply_dtype) - mean.astype(apply_dtype)) * inv.astype(
            apply_dtype
        )
        y = y.reshape(x.shape)
        return y * scale.astype(apply_dtype) + bias.astype(apply_dtype)


def _num_groups(ch: int) -> int:
    """min(ch // 4, 32) like the reference, stepped down to the nearest
    divisor of ch (widths like 144 = 96 + 48 skip-concat are not divisible
    by 32; torch GroupNorm — and hence the reference — simply cannot run
    such widths)."""
    g = max(min(ch // 4, 32), 1)
    while g > 1 and ch % g:
        g -= 1
    return g


def group_norm(ch, name=None, dtype=None):
    """GroupNorm(min(ch // 4, 32), eps=1e-6) as used throughout the UNet.
    dtype=None computes fully in float32 (reference-faithful default);
    jnp.bfloat16 selects f32-stats/low-precision-traffic
    (config key model.norm_dtype)."""
    follow = dtype is not None and dtype != jnp.float32
    return GroupNormF32Stats(
        num_groups=_num_groups(ch), epsilon=1e-6,
        follow_input_dtype=follow, name=name,
    )


def naive_upsample_2d(x, factor=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, 1, w, 1, c)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(b, h * factor, w * factor, c)


def naive_downsample_2d(x, factor=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))


class Upsample(nn.Module):
    """Nearest x2 upsample (+ optional conv), `layers.py:190-206`."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        h = naive_upsample_2d(x)
        if self.with_conv:
            h = conv3x3(x.shape[-1])(h)
        return h


class Downsample(nn.Module):
    """x2 downsample via strided conv (pad right/bottom) or mean-pool,
    `layers.py:209-227`."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = nn.Conv(
                x.shape[-1],
                (3, 3),
                strides=(2, 2),
                padding="VALID",
                kernel_init=default_init(),
                bias_init=nn.initializers.zeros,
            )(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResnetBlockDDPM(nn.Module):
    """DDPM-style resblock (`layers.py:230-273`)."""

    act: callable
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: object = None
    norm_dtype: object = None

    @nn.compact
    def __call__(self, x, temb=None, train=False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(group_norm(in_ch, dtype=self.norm_dtype)(x))
        h = conv3x3(out_ch, dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=default_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
            )(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, dtype=self.norm_dtype)(h))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype)(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, dtype=self.dtype)(x)
            else:
                x = nin(out_ch, dtype=self.dtype)(x)
        out = x + h
        return out / math.sqrt(2.0) if self.skip_rescale else out


class ResnetBlockBigGAN(nn.Module):
    """BigGAN-style resblock with in-block naive up/downsampling
    (`layers.py:276-326`)."""

    act: callable
    out_ch: int | None = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: object = None
    norm_dtype: object = None

    @nn.compact
    def __call__(self, x, temb=None, train=False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(group_norm(in_ch, dtype=self.norm_dtype)(x))

        if self.up:
            h = naive_upsample_2d(h)
            x = naive_upsample_2d(x)
        elif self.down:
            h = naive_downsample_2d(h)
            x = naive_downsample_2d(x)

        h = conv3x3(out_ch, dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=default_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
            )(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, dtype=self.norm_dtype)(h))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype)(h)

        if in_ch != out_ch or self.up or self.down:
            x = conv1x1(out_ch, dtype=self.dtype)(x)

        out = x.astype(h.dtype) + h
        return out / math.sqrt(2.0) if self.skip_rescale else out


class AttnBlock(nn.Module):
    """Single-head self-attention over the full HW token grid, scale C^-0.5
    (`layers.py:147-176`), routed through the fused attention op instead of
    materializing (B, H, W, H*W) logits."""

    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: object = None
    norm_dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = group_norm(c, dtype=self.norm_dtype)(x)
        q = nin(c, dtype=self.dtype)(h).reshape(b, 1, hh * ww, c)
        k = nin(c, dtype=self.dtype)(h).reshape(b, 1, hh * ww, c)
        v = nin(c, dtype=self.dtype)(h).reshape(b, 1, hh * ww, c)
        h = dot_product_attention(q, k, v, scale=c**-0.5)
        h = h.reshape(b, hh, ww, c)
        h = nin(c, init_scale=self.init_scale, dtype=self.dtype)(h)
        out = x.astype(h.dtype) + h
        return out / math.sqrt(2.0) if self.skip_rescale else out
