"""Masked denoising-score-matching loss (pure JAX, NHWC).

Semantics of `/root/reference/score_sde_pytorch/losses.py:54-138`, redesigned
for jit: the SS block dropout operates on fixed-shape span arrays with
`jax.random` (the reference parses "s:e" strings with host `random.random`
per step), conditioning masks are built with channel-last indexing, and the
whole loss is a pure function of (params, batch, rng).

Batch layout (NHWC):
  coords_6d    (B, N, N, C) float
  mask_pair    (B, N, N)    bool
  ss_spans     (B, MAX_SS_BLOCKS, 2) int32, -1-padded  [only for "ss"]
  mask_inpaint (B, N, N)    bool (True = free/inpainted region) [optional]
  context      (B, T, D)    float  [optional]
  context_mask (B, T)       bool   [optional]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sde import bcast
from ..models.utils import get_score_fn


def block_dropout(key, coords_6d, ss_spans, p: float = 0.2):
    """Randomly zero SS-block channels 4:7 on rows AND columns of selected
    blocks (`/root/reference/score_sde_pytorch/losses.py:54-64`). Spans are
    end-exclusive, matching the reference's `[start:end]` slicing."""
    b, n = coords_6d.shape[0], coords_6d.shape[1]
    max_blocks = ss_spans.shape[1]
    drop = jax.random.uniform(key, (b, max_blocks)) < p
    valid = ss_spans[..., 0] >= 0
    drop = drop & valid
    pos = jnp.arange(n)
    in_span = (pos[None, None, :] >= ss_spans[..., 0:1]) & (
        pos[None, None, :] < ss_spans[..., 1:2]
    )  # (B, MAXB, N)
    dropped = jnp.any(in_span & drop[..., None], axis=1)  # (B, N)
    keep = ~(dropped[:, :, None] | dropped[:, None, :])  # (B, N, N)
    keep = keep[..., None].astype(coords_6d.dtype)
    return coords_6d.at[..., 4:7].multiply(keep)


def make_conditional_mask(coords_6d, condition, mask_inpaint=None):
    """True = entry participates in the loss / evolves during sampling; False
    = entry is clamped to its conditioning value
    (`/root/reference/score_sde_pytorch/losses.py:115-125`)."""
    cmask = jnp.ones(coords_6d.shape, dtype=bool)
    for c in condition or ():
        if c == "length":
            cmask = cmask.at[..., -1].set(False)
        elif c == "ss":
            cmask = cmask.at[..., 4:7].set(False)
        elif c == "inpainting":
            assert mask_inpaint is not None
            cmask = cmask & mask_inpaint[..., None]
        else:
            raise ValueError(f"unknown condition {c}")
    return cmask


def get_sde_loss_fn(sde, model, train: bool, condition=(), eps: float = 1e-5,
                    ss_dropout: float = 0.2, context_dropout: float = 0.0):
    """Returns loss_fn(params, batch, rng) -> scalar loss.

    `context_dropout` zeroes the whole caption embedding for a random subset
    of samples (null conditioning). The zero-context convention matches the
    reference's classifier-free-guidance null (`w*model(x, ctx) +
    (1-w)*model(x, 0*ctx)`, `/root/reference/sampler/diffusion_sampler.py:
    125-128`); the token mask is kept so masked attention stays well-defined.
    Training with it enables CFG sampling (sampling.cfg_scale > 1)."""
    condition = tuple(condition or ())

    def loss_fn(params, batch, rng, t=None, z=None):
        # `t`/`z` are injectable for deterministic parity testing against the
        # reference loss (tests/test_parity_torch.py); training passes None.
        coords_6d = batch["coords_6d"]
        mask_pair = batch["mask_pair"]
        b = coords_6d.shape[0]

        rng, k_drop, k_t, k_z, k_dropout, k_ctx = jax.random.split(rng, 6)

        context = batch.get("context")
        if train and context_dropout > 0.0 and context is not None:
            keep = (
                jax.random.uniform(k_ctx, (b,)) >= context_dropout
            ).astype(context.dtype)
            context = context * keep[:, None, None]

        if "ss" in condition:
            coords_6d = block_dropout(
                k_drop, coords_6d, batch["ss_spans"], p=ss_dropout
            )

        score_fn = get_score_fn(
            sde, model, params, train=train, dropout_rng=k_dropout
        )

        if t is None:
            t = jax.random.uniform(k_t, (b,)) * (sde.T - eps) + eps
        if z is None:
            z = jax.random.normal(k_z, coords_6d.shape)
        mean, std = sde.marginal_prob(coords_6d, t)
        perturbed = mean + bcast(std, coords_6d.ndim) * z

        cmask = make_conditional_mask(
            coords_6d, condition, batch.get("mask_inpaint")
        )
        mask = mask_pair[..., None] & cmask
        num_elem = jnp.sum(mask.reshape(b, -1), axis=-1)

        perturbed = jnp.where(mask, perturbed, coords_6d)
        score = score_fn(
            perturbed, t, context, batch.get("context_mask")
        )
        losses = jnp.square(score * bcast(std, score.ndim) + z) * mask
        losses = jnp.sum(losses.reshape(b, -1), axis=-1)
        losses = losses / (num_elem + 1e-8)
        return jnp.mean(losses)

    return loss_fn
