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
                    heun=True, final_langevin=0, snr=0.17, chunk_size=None):
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
    `chunk_size`: scan steps per device launch (snapped to a divisor of
    `num_steps` via `pick_chunk`); required at N=256+batch sizes where a
    single launch exceeds the tunnel's per-launch wall-clock cap.
    """
    sde_sampler = (
        dataclasses.replace(sde, N=num_steps) if num_steps != sde.N else sde
    )
    timesteps = jnp.linspace(sde_sampler.T, eps, num_steps + 1)
    nfe = (num_steps * (2 if heun else 1) + final_langevin
           + (1 if denoise else 0))
    vec_eps = jnp.full((shape[0],), eps)

    def _make_parts(params, context, context_mask, cmask, x_initial):
        base_score_fn = get_score_fn(sde, model, params, train=False)

        def drift(x, t):
            vec_t = jnp.full((shape[0],), t)
            f, g = sde_sampler.sde(x, vec_t)
            score = base_score_fn(x, vec_t, context, context_mask)
            return f - 0.5 * bcast(g, x.ndim) ** 2 * score

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

        def finish(x, key):
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
                    x = (x + step_size * grad
                         + jnp.sqrt(2.0 * step_size) * noise)
                    return (jnp.where(cmask, x, x_initial), key), None

                (x, key), _ = jax.lax.scan(
                    langevin, (x, key), None, length=final_langevin)

            if denoise:
                # terminal Tweedie: E[x_0 | x_eps] = x + sigma(eps)^2 score
                _, std_eps = sde_sampler.marginal_prob(
                    jnp.zeros_like(x), vec_eps)
                score = base_score_fn(x, vec_eps, context, context_mask)
                x = x + bcast(std_eps, x.ndim) ** 2 * score

            return jnp.where(cmask, x, x_initial)

        return step, finish

    @jax.jit
    def sampler(params, key, condition=None, context=None, context_mask=None):
        key, sub = jax.random.split(key)
        x = sde_sampler.prior_sampling(sub, shape)
        x, cmask = apply_condition(x, condition)
        x_initial = x
        step, finish = _make_parts(params, context, context_mask,
                                   cmask, x_initial)
        x, _ = jax.lax.scan(step, x, (timesteps[:-1], timesteps[1:]))
        return finish(x, key), nfe

    from .sampling import pick_chunk

    chunk = pick_chunk(num_steps, chunk_size) if chunk_size else None
    if chunk is None:
        return sampler

    # --- chunked variant: same math, multiple launches per trajectory ------
    import numpy as np

    @jax.jit
    def _init(key, condition=None):
        key, sub = jax.random.split(key)
        x = sde_sampler.prior_sampling(sub, shape)
        x, cmask = apply_condition(x, condition)
        return x, cmask, key

    @jax.jit
    def _chunk(params, x, t_pairs, cmask, x_initial,
               context=None, context_mask=None):
        step, _ = _make_parts(params, context, context_mask,
                              cmask, x_initial)
        x, _ = jax.lax.scan(step, x, t_pairs)
        return x

    @jax.jit
    def _finish(params, x, key, cmask, x_initial,
                context=None, context_mask=None):
        _, finish = _make_parts(params, context, context_mask,
                                cmask, x_initial)
        return finish(x, key)

    def chunked_sampler(params, key, condition=None, context=None,
                        context_mask=None):
        x, cmask, key = _init(key, condition)
        x_initial = x
        t0s, t1s = timesteps[:-1], timesteps[1:]
        for i in range(0, num_steps, chunk):
            x = _chunk(params, x, (t0s[i:i + chunk], t1s[i:i + chunk]),
                       cmask, x_initial, context, context_mask)
            # Inter-chunk barrier via a scalar host transfer (the tunnel's
            # block_until_ready does not guarantee completion).
            np.asarray(x[(0,) * x.ndim])
        x = _finish(params, x, key, cmask, x_initial, context, context_mask)
        return x, nfe

    return chunked_sampler


def get_hybrid_sampler(sde, model, shape, ode_steps=60, pc_steps=170,
                       sigma_cross=2.0, snr=0.17, n_steps=1, denoise=True,
                       eps=1e-5, cfg_scale=1.0, chunk_size=None):
    """ODE head + PC tail: deployment sampler recovering PC realization
    quality at a fraction of the NFE.

    Motivation (reports/ode_nfe_sweep.json): pure Heun ODE samples plateau
    ~11% below the PC chain in TM regardless of NFE, and realize at ~13x
    higher restraint energy, even though their 6D MSE is BETTER — the
    deterministic trajectory lands on maps whose channels are mutually
    inconsistent, and the restraint minimizer pays for it. The stochastic
    Langevin churn of the PC chain (`/root/reference/score_sde_pytorch/
    sampling.py:170-199`) is what keeps channels consistent, and it only
    matters at LOW sigma where fine structure forms. So: integrate the
    probability-flow ODE over the smooth high-sigma regime
    (sigma_max -> sigma_cross), then hand off to the corrector+predictor
    chain for sigma_cross -> sigma_min.

    The PC tail reuses the ladder convention of `get_pc_sampler`: a
    full-range re-discretized SDE whose step spacing equals the tail's, so
    VESDE.discretize's G = sqrt(sigma_t^2 - sigma_{t-1}^2) spans exactly
    one sampled step. NFE = 2*ode_steps + pc_steps*(n_steps+1), doubled
    under classifier-free guidance (cfg_scale != 1 evaluates s_cond and
    s_null per score call, matching get_pc_sampler's convention).

    `chunk_size` (scan steps per device launch) splits each phase into
    multiple launches, like `get_pc_sampler`'s chunked variant — required
    at N=256 where a single hybrid launch exceeds the tunnel's per-launch
    wall-clock cap. The value is snapped to a divisor of each phase length
    (`pick_chunk`) so every launch reuses one compiled graph per phase.
    None, or a value at least as large as both phases, keeps the
    one-launch path.
    """
    from .sampling import get_predictor, get_corrector

    # crossover time: sigma(t) = sigma_min*(sigma_max/sigma_min)^t
    import math

    t_cross = (
        math.log(sigma_cross / sde.sigma_min)
        / math.log(sde.sigma_max / sde.sigma_min)
    ) * sde.T
    # full-range ladder whose spacing matches the PC tail's, with the tail's
    # first point landing on (approximately) t_cross
    spacing = (t_cross - eps) / max(pc_steps - 1, 1)
    n_full = int(round((sde.T - eps) / spacing)) + 1
    sde_tail = dataclasses.replace(sde, N=n_full)
    timesteps_full = jnp.linspace(sde.T, eps, n_full)
    t_pc = timesteps_full[n_full - pc_steps:]
    t_handoff = float(t_pc[0])

    predictor_cls = get_predictor("reverse_diffusion")
    corrector_cls = get_corrector("langevin")
    guided = cfg_scale != 1.0

    t_ode = jnp.linspace(sde.T, t_handoff, ode_steps + 1)
    base_nfe = 2 * ode_steps + pc_steps * (n_steps + 1)

    def _nfe(context):
        # CFG doubles every score eval (s_cond + s_null), matching
        # get_pc_sampler's NFE convention.
        return base_nfe * (2 if (guided and context is not None) else 1)

    def _make_steps(params, context, context_mask, cmask, x_initial):
        base_score_fn = get_score_fn(sde, model, params, train=False)

        if guided and context is not None:
            def score_fn(x, t):
                s_cond = base_score_fn(x, t, context, context_mask)
                s_null = base_score_fn(
                    x, t, jnp.zeros_like(context), context_mask)
                return cfg_scale * s_cond + (1.0 - cfg_scale) * s_null
        else:
            def score_fn(x, t):
                return base_score_fn(x, t, context, context_mask)

        def drift(x, t):
            vec_t = jnp.full((shape[0],), t)
            f, g = sde.sde(x, vec_t)
            return f - 0.5 * bcast(g, x.ndim) ** 2 * score_fn(x, vec_t)

        def ode_step(x, inp):
            t, t_next = inp
            dt = t_next - t
            d1 = drift(x, t)
            d2 = drift(x + d1 * dt, t_next)
            x_new = x + 0.5 * (d1 + d2) * dt
            return jnp.where(cmask, x_new, x_initial), None

        pred = predictor_cls(sde_tail, score_fn, False)
        corr = corrector_cls(sde_tail, score_fn, snr, n_steps)

        def pc_step(carry, t):
            x, _x_mean, key = carry
            vec_t = jnp.full((shape[0],), t)
            key, kc, kp = jax.random.split(key, 3)
            x, x_mean = corr.update_fn(kc, x, vec_t)
            x = jnp.where(cmask, x, x_initial)
            x, x_mean = pred.update_fn(kp, x, vec_t)
            x = jnp.where(cmask, x, x_initial)
            return (x, x_mean, key), None

        return ode_step, pc_step

    @jax.jit
    def sampler(params, key, condition=None, context=None, context_mask=None):
        key, sub = jax.random.split(key)
        x = sde.prior_sampling(sub, shape)
        x, cmask = apply_condition(x, condition)
        x_initial = x
        ode_step, pc_step = _make_steps(params, context, context_mask,
                                        cmask, x_initial)

        # --- ODE head: Heun over [T, t_handoff] -------------------------
        x, _ = jax.lax.scan(ode_step, x, (t_ode[:-1], t_ode[1:]))

        # --- PC tail: corrector + predictor over [t_handoff, eps] -------
        (x, x_mean, _), _ = jax.lax.scan(pc_step, (x, x, key), t_pc)
        x_mean = jnp.where(cmask, x_mean, x_initial)
        return (x_mean if denoise else x), _nfe(context)

    # Snap the requested chunk to a divisor of each phase so every chunk
    # launch reuses one compiled graph per phase (a ragged tail chunk would
    # compile a second XLA program — 7-15 min each at N=256 on the tunnel).
    from .sampling import pick_chunk

    ode_chunk = pick_chunk(ode_steps, chunk_size) if chunk_size else None
    pc_chunk = pick_chunk(pc_steps, chunk_size) if chunk_size else None
    if ode_chunk is None and pc_chunk is None:
        return sampler

    # --- chunked variant: same math, multiple launches per phase ---------
    import numpy as np

    @jax.jit
    def _init(key, condition=None):
        key, sub = jax.random.split(key)
        x = sde.prior_sampling(sub, shape)
        x, cmask = apply_condition(x, condition)
        return x, cmask, key

    @jax.jit
    def _ode_chunk(params, x, t_pairs, cmask, x_initial,
                   context=None, context_mask=None):
        ode_step, _ = _make_steps(params, context, context_mask,
                                  cmask, x_initial)
        x, _ = jax.lax.scan(ode_step, x, t_pairs)
        return x

    @jax.jit
    def _pc_chunk(params, x, x_mean, key, t_chunk, cmask, x_initial,
                  context=None, context_mask=None):
        _, pc_step = _make_steps(params, context, context_mask,
                                 cmask, x_initial)
        (x, x_mean, key), _ = jax.lax.scan(pc_step, (x, x_mean, key), t_chunk)
        return x, x_mean, key

    def chunked_sampler(params, key, condition=None, context=None,
                        context_mask=None):
        x, cmask, key = _init(key, condition)
        x_initial = x
        t0s, t1s = t_ode[:-1], t_ode[1:]
        oc = ode_chunk or ode_steps
        for i in range(0, ode_steps, oc):
            x = _ode_chunk(params, x, (t0s[i:i + oc], t1s[i:i + oc]),
                           cmask, x_initial, context, context_mask)
            # Inter-chunk barrier via a scalar host transfer (the tunnel's
            # block_until_ready does not guarantee completion).
            np.asarray(x[(0,) * x.ndim])
        x_mean = x
        pcc = pc_chunk or pc_steps
        for i in range(0, pc_steps, pcc):
            x, x_mean, key = _pc_chunk(params, x, x_mean, key,
                                       t_pc[i:i + pcc],
                                       cmask, x_initial, context,
                                       context_mask)
            np.asarray(x[(0,) * x.ndim])
        x_mean = jnp.where(cmask, x_mean, x_initial)
        return (x_mean if denoise else x), _nfe(context)

    return chunked_sampler
