"""Score UNet (NCSN++-derived with text cross-attention), Flax linen, NHWC.

Topology matches the reference `UNetModel` block-for-block
(`/root/reference/score_sde_pytorch/models/ncsnpp.py:71-263`):
  * time: sinusoidal embedding -> Linear(nf*4) -> Linear(nf*4) with NO
    activation between (the reference applies its pre_blocks sequentially
    without an act, `ncsnpp.py:227-228` — reproduced faithfully);
  * stem conv3x3(C -> nf);
  * down path: len(ch_mult) levels x num_res_blocks BigGAN resblocks, with
    AttnBlock + SpatialTransformer at resolutions in attn_resolutions,
    down-resampling via ResnetBlock(down=True) between levels;
  * mid: Res -> Attn -> SpatialTransformer -> Res;
  * up path mirrored with skip concatenation (num_res_blocks + 1 per level),
    up-resampling via ResnetBlock(up=True);
  * out: GroupNorm -> act -> conv3x3(-> C, zero-ish init);
  * if scale_by_sigma, divide the output by sigmas[time_cond] (`:259-262`).

The model consumes/produces NHWC (B, N, N, C); time_cond is the (B,) label
vector (sigma-ladder indices for VE; see models/utils.get_score_fn).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from . import layers
from .attention import SpatialTransformer
from .registry import register_model, get_model
from ..diffusion.sde import get_sigmas


@register_model(name="ncsnpp")
class ScoreUNet(nn.Module):
    num_channels: int
    max_res_num: int
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.1
    n_heads: int = 8
    context_dim: int = 4096
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    init_scale: float = 0.0
    nonlinearity: str = "swish"
    scale_by_sigma: bool = True
    sigma_min: float = 0.01
    sigma_max: float = 100.0
    num_scales: int = 2000
    remat_attention: bool = True
    # Rematerialize resblock activations in the backward pass. Off by
    # default (the L=128 flagship fits comfortably); enables larger train
    # batches at N=256 nf=256 where activations, not params, cap HBM
    # (B=4 fused-10 needs 18.4G of 15.75G without it).
    remat_resblocks: bool = False
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params stay f32
    norm_dtype: object = None  # normalization compute dtype (None = float32)

    @nn.compact
    def __call__(self, x, time_cond, context=None, context_mask=None, train=False):
        assert x.shape[-1] == self.num_channels, (
            f"expected NHWC input with C={self.num_channels}, got {x.shape}"
        )
        act = layers.get_act(self.nonlinearity)
        num_resolutions = len(self.ch_mult)
        all_resolutions = [
            self.max_res_num // (2**i) for i in range(num_resolutions)
        ]

        def resblock(out_ch=None, up=False, down=False):
            cls = (
                layers.ResnetBlockBigGAN
                if self.resblock_type == "biggan"
                else layers.ResnetBlockDDPM
            )
            kwargs = dict(
                act=act,
                out_ch=out_ch,
                dropout=self.dropout,
                skip_rescale=self.skip_rescale,
                init_scale=self.init_scale,
                dtype=self.dtype,
                norm_dtype=self.norm_dtype,
            )
            if self.resblock_type == "biggan":
                kwargs.update(up=up, down=down)
            if self.remat_resblocks:
                # static_argnums counts the bound module as arg 0, so the
                # python-bool `train` flag of __call__(self, x, temb, train)
                # sits at index 3. Keep the original class name: linen
                # auto-names modules by type name, and the default
                # "Checkpoint<cls>" prefix would put params under different
                # keys than the un-remat model — breaking checkpoint
                # compatibility across the flag.
                base_name = cls.__name__
                cls = nn.remat(cls, static_argnums=(3,))
                cls.__name__ = base_name
            return cls(**kwargs)

        def attn_pair(h, ctx, ctx_mask):
            h = layers.AttnBlock(
                skip_rescale=self.skip_rescale, init_scale=self.init_scale,
                dtype=self.dtype, norm_dtype=self.norm_dtype,
            )(h)
            h = SpatialTransformer(
                n_heads=self.n_heads,
                d_head=h.shape[-1] // self.n_heads,
                dropout=self.dropout,
                remat=self.remat_attention,
                dtype=self.dtype,
                norm_dtype=self.norm_dtype,
            )(h, ctx, ctx_mask, train)
            return h

        # Time embedding: sinusoidal -> two Linears with no act between
        # (faithful to the reference's pre_blocks, ncsnpp.py:100-107,227-228).
        temb = layers.get_timestep_embedding(time_cond, self.nf)
        temb = nn.Dense(
            self.nf * 4,
            kernel_init=layers.default_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(temb)
        temb = nn.Dense(
            self.nf * 4,
            kernel_init=layers.default_init(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(temb)

        # Stem.
        h = layers.conv3x3(self.nf, dtype=self.dtype)(
            x.astype(self.dtype or jnp.float32)
        )
        hs = [h]

        # Down path.
        for i_level in range(num_resolutions):
            for _ in range(self.num_res_blocks):
                out_ch = self.nf * self.ch_mult[i_level]
                h = resblock(out_ch=out_ch)(h, temb, train)
                if all_resolutions[i_level] in self.attn_resolutions:
                    h = attn_pair(h, context, context_mask)
                hs.append(h)
            if i_level != num_resolutions - 1:
                h = resblock(down=True)(h, temb, train)
                hs.append(h)

        # Mid.
        h = resblock()(h, temb, train)
        h = attn_pair(h, context, context_mask)
        h = resblock()(h, temb, train)

        # Up path with skip concatenation.
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = self.nf * self.ch_mult[i_level]
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = resblock(out_ch=out_ch)(h, temb, train)
                if all_resolutions[i_level] in self.attn_resolutions:
                    h = attn_pair(h, context, context_mask)
                if i_level != 0 and i_block == self.num_res_blocks:
                    h = resblock(up=True)(h, temb, train)
        assert not hs

        # Output head (always float32: the score is divided by sigmas as
        # small as sigma_min=0.01, which bf16 cannot represent accurately).
        h = act(layers.group_norm(h.shape[-1])(h))  # f32 norm at the head
        h = layers.conv3x3(self.num_channels, init_scale=self.init_scale)(
            h.astype(jnp.float32)
        )

        if self.scale_by_sigma:
            sigmas = jnp.asarray(
                get_sigmas(self.sigma_min, self.sigma_max, self.num_scales)
            )
            used_sigmas = sigmas[time_cond.astype(jnp.int32)]
            h = h / used_sigmas.reshape(-1, *([1] * (x.ndim - 1)))

        return h


def build_model(config) -> ScoreUNet:
    """Construct the score model named by `config.model.name` via the
    registry (the reference hardcodes UNetModel at this point,
    `/root/reference/score_sde_pytorch/utils.py:4-9`)."""
    m = config.model
    cls = get_model(m.get("name", "ncsnpp"))
    return cls(
        num_channels=config.data.num_channels,
        max_res_num=config.data.max_res_num,
        nf=m.nf,
        ch_mult=tuple(m.ch_mult),
        num_res_blocks=m.num_res_blocks,
        attn_resolutions=tuple(m.attn_resolutions),
        dropout=m.dropout,
        n_heads=m.n_heads,
        context_dim=m.context_dim,
        skip_rescale=m.skip_rescale,
        resblock_type=m.resblock_type.lower(),
        init_scale=m.init_scale,
        nonlinearity=m.nonlinearity,
        scale_by_sigma=m.scale_by_sigma,
        sigma_min=m.sigma_min,
        sigma_max=m.sigma_max,
        num_scales=m.num_scales,
        remat_resblocks=bool(m.get("remat_resblocks", False)),
        dtype={"float32": None, "bfloat16": jnp.bfloat16}[
            str(m.get("dtype", "float32"))
        ],
        norm_dtype={"float32": None, "bfloat16": jnp.bfloat16}[
            str(m.get("norm_dtype", "float32"))
        ],
    )
