"""Score-function wrappers and sigma ladders.

Reproduces the time/label conventions of `/root/reference/score_sde_pytorch/
models/utils.py:97-176` — the subtle part of score-SDE:

  * VE SDE: labels = round((T - t) * (N - 1)) index the DESCENDING sigma
    ladder (t=T -> label 0 -> sigma_max); the raw model output IS the score
    (the model already divides by sigma via scale_by_sigma).
  * VP/sub-VP SDE: labels = t * (N - 1); score = -model(x, labels) / std.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..diffusion import sde as sde_lib
from ..diffusion.sde import get_sigmas, bcast


def get_sigmas_for_config(config):
    return get_sigmas(
        config.model.sigma_min, config.model.sigma_max, config.model.num_scales
    )


def get_model_fn(model, params, train=False, dropout_rng=None):
    """Bind a Flax module + params into a plain callable."""

    def model_fn(x, labels, context=None, context_mask=None):
        rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
        return model.apply(
            {"params": params},
            x,
            labels,
            context=context,
            context_mask=context_mask,
            train=train,
            rngs=rngs,
        )

    return model_fn


def get_score_fn(sde, model, params, train=False, continuous=False, dropout_rng=None):
    """Wrap the model into a time-dependent score function score(x, t, ctx)."""
    model_fn = get_model_fn(model, params, train=train, dropout_rng=dropout_rng)

    if isinstance(sde, (sde_lib.VPSDE, sde_lib.subVPSDE)):

        def score_fn(x, t, context=None, context_mask=None):
            if continuous or isinstance(sde, sde_lib.subVPSDE):
                labels = t * 999
                out = model_fn(x, labels, context, context_mask)
                std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = t * (sde.N - 1)
                out = model_fn(x, labels, context, context_mask)
                std = sde.sqrt_1m_alphas_cumprod[labels.astype(jnp.int32)]
            return -out / bcast(std, x.ndim)

    elif isinstance(sde, sde_lib.VESDE):

        def score_fn(x, t, context=None, context_mask=None):
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                labels = jnp.round((sde.T - t) * (sde.N - 1))
            return model_fn(x, labels, context, context_mask)

    else:
        raise NotImplementedError(f"SDE class {type(sde).__name__} not supported.")

    return score_fn
