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
                    heun=True, final_langevin=0, snr=0.17):
    """Build a jit-compiled Heun probability-flow ODE sampler.

    Returns sampler(params, key, condition=None, context=None,
    context_mask=None) -> (samples, nfe). The key seeds the prior (and the
    final Langevin churn, when enabled).

    `denoise`: apply the terminal Tweedie step x + sigma(eps)^2 * score (the
    PC chain's noise_removal analog, `/root/reference/score_sde_pytorch/
    sampling.py:287`). `final_langevin`: N corrector steps at t=eps after
    integration — ODE trajectories land slightly off the data manifold and
    realize to much higher restraint energies than PC samples (r2 report:
    10x); a few Langevin steps snap them back at negligible NFE cost.
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

        nfe = num_steps * (2 if heun else 1)
        vec_eps = jnp.full((shape[0],), eps)

        if final_langevin > 0:
            # Langevin corrector churn at t=eps (`/root/reference/
            # score_sde_pytorch/sampling.py:190-198` step-size rule)
            def langevin(carry, _):
                x, key = carry
                key, sub = jax.random.split(key)
                grad = base_score_fn(x, vec_eps, context, context_mask)
                noise = jax.random.normal(sub, x.shape)
                g_norm = jnp.sqrt(
                    jnp.mean(grad.reshape(shape[0], -1) ** 2, -1))
                n_norm = jnp.sqrt(
                    jnp.mean(noise.reshape(shape[0], -1) ** 2, -1))
                step_size = bcast(
                    2.0 * (snr * n_norm / (g_norm + 1e-12)) ** 2, x.ndim)
                x = x + step_size * grad + jnp.sqrt(2.0 * step_size) * noise
                return (jnp.where(cmask, x, x_initial), key), None

            (x, key), _ = jax.lax.scan(
                langevin, (x, key), None, length=final_langevin)
            nfe += final_langevin

        if denoise:
            # terminal Tweedie step: E[x_0 | x_eps] = x + sigma(eps)^2 score
            _, std_eps = sde_sampler.marginal_prob(jnp.zeros_like(x), vec_eps)
            score = base_score_fn(x, vec_eps, context, context_mask)
            x = x + bcast(std_eps, x.ndim) ** 2 * score
            nfe += 1

        x = jnp.where(cmask, x, x_initial)
        return x, nfe

    return sampler
