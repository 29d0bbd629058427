"""Probability-flow ODE sampler with Heun (2nd-order) steps.

Beyond reference parity: the reference only integrates the reverse SDE with
2 NFE per step (2000 steps => 4000 NFE). The probability-flow ODE
dx = [f(x,t) - 1/2 G(t)^2 score(x,t)] dt shares the SDE's marginals, is
deterministic, and integrates accurately with far fewer steps; Heun's method
(one predictor + one corrector evaluation per step, EDM-style) gives
2nd-order accuracy, so ~50-100 steps reach the quality of the 2000-step PC
chain on smooth score fields. Conditioning clamps run per step like the PC
sampler.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .sde import bcast
from .sampling import apply_condition
from ..models.utils import get_score_fn


def get_ode_sampler(sde, model, shape, num_steps=100, denoise=True, eps=1e-5,
                    heun=True):
    """Build a jit-compiled Heun probability-flow ODE sampler.

    Returns sampler(params, key, condition=None, context=None,
    context_mask=None) -> (samples, nfe). The key only seeds the prior.
    """
    sde_sampler = (
        dataclasses.replace(sde, N=num_steps) if num_steps != sde.N else sde
    )

    @jax.jit
    def sampler(params, key, condition=None, context=None, context_mask=None):
        base_score_fn = get_score_fn(sde, model, params, train=False)

        def drift(x, t):
            vec_t = jnp.full((shape[0],), t)
            f, g = sde_sampler.sde(x, vec_t)
            score = base_score_fn(x, vec_t, context, context_mask)
            return f - 0.5 * bcast(g, x.ndim) ** 2 * score

        key, sub = jax.random.split(key)
        x = sde_sampler.prior_sampling(sub, shape)
        timesteps = jnp.linspace(sde_sampler.T, eps, num_steps + 1)

        x, cmask = apply_condition(x, condition)
        x_initial = x

        def step(x, inp):
            t, t_next = inp
            dt = t_next - t  # negative
            d1 = drift(x, t)
            x_euler = x + d1 * dt
            if heun:
                d2 = drift(x_euler, t_next)
                x_new = x + 0.5 * (d1 + d2) * dt
            else:
                x_new = x_euler
            x_new = jnp.where(cmask, x_new, x_initial)
            return x_new, None

        pairs = (timesteps[:-1], timesteps[1:])
        x, _ = jax.lax.scan(step, x, pairs)
        x = jnp.where(cmask, x, x_initial)
        nfe = num_steps * (2 if heun else 1)
        return x, nfe

    return sampler
