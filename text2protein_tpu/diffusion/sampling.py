"""Predictor-Corrector sampling as a single on-device `lax.scan`.

The reference drives its N=2000-step PC loop from Python, reconstructing
predictor/corrector objects every step (`/root/reference/score_sde_pytorch/
sampling.py:201-211,279-285`) — one host round-trip per step. Here the whole
reverse trajectory (corrector -> clamp -> predictor -> clamp) is one scan body
compiled once; conditioning overwrite/clamping and the Langevin step-size
computation (global grad/noise norms) live inside the scan. The text context
is bound into the score function once, outside the loop.

Registries mirror the reference decorator API (`sampling.py:32-75`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import sde as sde_lib
from .sde import bcast
from ..models.utils import get_score_fn

_PREDICTORS = {}
_CORRECTORS = {}


def register_predictor(cls=None, *, name=None):
    def _register(c):
        local = name or c.__name__
        if local in _PREDICTORS:
            raise ValueError(f"Already registered predictor: {local}")
        _PREDICTORS[local] = c
        return c

    return _register if cls is None else _register(cls)


def register_corrector(cls=None, *, name=None):
    def _register(c):
        local = name or c.__name__
        if local in _CORRECTORS:
            raise ValueError(f"Already registered corrector: {local}")
        _CORRECTORS[local] = c
        return c

    return _register if cls is None else _register(cls)


def get_predictor(name):
    return _PREDICTORS[name]


def get_corrector(name):
    return _CORRECTORS[name]


class Predictor:
    """score_fn here is already context-bound: score_fn(x, t) -> score."""

    def __init__(self, sde, score_fn, probability_flow=False):
        self.sde = sde
        self.rsde = sde.reverse(score_fn, probability_flow)
        self.score_fn = score_fn

    def update_fn(self, key, x, t):
        raise NotImplementedError


class Corrector:
    def __init__(self, sde, score_fn, snr, n_steps):
        self.sde = sde
        self.score_fn = score_fn
        self.snr = snr
        self.n_steps = n_steps

    def update_fn(self, key, x, t):
        raise NotImplementedError


@register_predictor(name="reverse_diffusion")
class ReverseDiffusionPredictor(Predictor):
    def update_fn(self, key, x, t):
        f, G = self.rsde.discretize(x, t)
        z = jax.random.normal(key, x.shape)
        x_mean = x - f
        x = x_mean + bcast(G, x.ndim) * z
        return x, x_mean


@register_predictor(name="euler_maruyama")
class EulerMaruyamaPredictor(Predictor):
    def update_fn(self, key, x, t):
        dt = -1.0 / self.rsde.N
        z = jax.random.normal(key, x.shape)
        drift, diffusion = self.rsde.sde(x, t)
        x_mean = x + drift * dt
        x = x_mean + bcast(diffusion, x.ndim) * jnp.sqrt(-dt) * z
        return x, x_mean


@register_predictor(name="none")
class NonePredictor(Predictor):
    def __init__(self, *args, **kwargs):
        pass

    def update_fn(self, key, x, t):
        return x, x


@register_corrector(name="langevin")
class LangevinCorrector(Corrector):
    """`/root/reference/score_sde_pytorch/sampling.py:170-199`: n_steps of
    step = 2*alpha*(snr*||z||/||grad||)^2; norms are batch means."""

    def update_fn(self, key, x, t):
        sde = self.sde
        if isinstance(sde, (sde_lib.VPSDE, sde_lib.subVPSDE)):
            timestep = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
            alpha = sde.alphas[timestep]
        else:
            alpha = jnp.ones_like(t)

        def one_step(carry, k):
            x, _ = carry
            grad = self.score_fn(x, t)
            noise = jax.random.normal(k, x.shape)
            b = x.shape[0]
            grad_norm = jnp.mean(jnp.linalg.norm(grad.reshape(b, -1), axis=-1))
            noise_norm = jnp.mean(jnp.linalg.norm(noise.reshape(b, -1), axis=-1))
            step_size = (self.snr * noise_norm / grad_norm) ** 2 * 2 * alpha
            x_mean = x + bcast(step_size, x.ndim) * grad
            x = x_mean + bcast(jnp.sqrt(step_size * 2), x.ndim) * noise
            return (x, x_mean), None

        keys = jax.random.split(key, self.n_steps)
        (x, x_mean), _ = jax.lax.scan(one_step, (x, x), keys)
        return x, x_mean


@register_corrector(name="none")
class NoneCorrector(Corrector):
    def __init__(self, *args, **kwargs):
        pass

    def update_fn(self, key, x, t):
        return x, x


def apply_condition(x, condition):
    """Overwrite the prior sample with conditioning information and build the
    conditional mask (True = free), `/root/reference/score_sde_pytorch/
    sampling.py:260-277`. Channel-last layout."""
    cmask = jnp.ones(x.shape, dtype=bool)
    if condition:
        for k, v in condition.items():
            if k == "length":
                v = v.astype(x.dtype)  # (B, N, N)
                x = x * v[..., None]
                cmask = cmask & v[..., None].astype(bool)
                x = x.at[..., -1].set(v)
                cmask = cmask.at[..., -1].set(False)
            elif k == "ss":
                x = x.at[..., 4:7].set(v)  # v: (B, N, N, 3)
                cmask = cmask.at[..., 4:7].set(False)
            elif k == "inpainting":
                coords_6d = v["coords_6d"]
                mask_inpaint = v["mask_inpaint"]  # True = region to inpaint
                cmask = cmask & mask_inpaint[..., None]
                x = jnp.where(cmask, x, coords_6d)
            else:
                raise ValueError(f"unknown condition {k}")
    return x, cmask


def pick_chunk(num_steps: int, target: int):
    """Largest divisor of `num_steps` that is <= `target` (None when a single
    launch suffices). Keeps chunked launches under the platform's per-launch
    wall-clock cap without tripping the N % chunk_size == 0 requirement."""
    if num_steps <= target:
        return None
    for d in range(target, 0, -1):
        if num_steps % d == 0:
            return d
    return None


def get_pc_sampler(
    sde,
    model,
    shape,
    predictor="reverse_diffusion",
    corrector="langevin",
    snr=0.17,
    n_steps=1,
    probability_flow=False,
    denoise=True,
    eps=1e-5,
    num_steps=None,
    chunk_size=None,
    cfg_scale=1.0,
):
    """Build a jit-compiled PC sampler.

    Returns sampler(params, key, condition=None, context=None,
    context_mask=None) -> (samples (B, N, N, C), nfe). `num_steps` overrides
    sde.N for faster schedules (NFE = num_steps * (n_steps + 1)).

    `cfg_scale` > 1 applies classifier-free guidance on the text context:
    score = w*s(x, ctx) + (1-w)*s(x, 0*ctx). The null condition is the
    zeroed caption embedding (the reference's convention in its DDIM CFG
    path); requires a model trained with `model.context_dropout` > 0.
    Doubles the NFE when active.

    `chunk_size` splits the reverse trajectory into multiple device launches
    of at most that many steps (one compiled scan reused across chunks) —
    needed where a single device execution has a wall-clock cap, and useful
    for mid-sampling preemption checkpoints. None = one launch.
    """
    import dataclasses

    predictor_cls = get_predictor(predictor.lower())
    corrector_cls = get_corrector(corrector.lower())
    N = num_steps or sde.N
    # When stepping fewer times than the model's ladder, the SAMPLER needs a
    # consistently re-discretized SDE (its G must span one sampled step, not
    # one model-ladder step) while the SCORE FUNCTION keeps the model's
    # num_scales label convention.
    sde_sampler = dataclasses.replace(sde, N=N) if N != sde.N else sde

    guided = cfg_scale != 1.0

    def _make_step(params, context, context_mask, cmask, x_initial):
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

        pred = predictor_cls(sde_sampler, score_fn, probability_flow)
        corr = corrector_cls(sde_sampler, score_fn, snr, n_steps)

        def step(carry, t):
            x, _x_mean, key = carry
            vec_t = jnp.full((shape[0],), t)
            key, kc, kp = jax.random.split(key, 3)
            x, x_mean = corr.update_fn(kc, x, vec_t)
            x = jnp.where(cmask, x, x_initial)
            x, x_mean = pred.update_fn(kp, x, vec_t)
            x = jnp.where(cmask, x, x_initial)
            return (x, x_mean, key), None

        return step

    @jax.jit
    def sampler(params, key, condition=None, context=None, context_mask=None):
        key, sub = jax.random.split(key)
        x = sde_sampler.prior_sampling(sub, shape)
        timesteps = jnp.linspace(sde_sampler.T, eps, N)

        x, cmask = apply_condition(x, condition)
        x_initial = x
        step = _make_step(params, context, context_mask, cmask, x_initial)
        (x, x_mean, _), _ = jax.lax.scan(step, (x, x, key), timesteps)
        x_mean = jnp.where(cmask, x_mean, x_initial)
        mult = 2 if (guided and context is not None) else 1
        return (x_mean if denoise else x), N * (n_steps + 1) * mult

    if chunk_size is None or chunk_size >= N:
        return sampler

    # --- chunked variant: same math, multiple launches -----------------------
    assert N % chunk_size == 0, (N, chunk_size)

    @jax.jit
    def _init(params, key, condition=None, context=None, context_mask=None):
        key, sub = jax.random.split(key)
        x = sde_sampler.prior_sampling(sub, shape)
        x, cmask = apply_condition(x, condition)
        return x, cmask, key

    @jax.jit
    def _chunk(params, x, x_mean, key, t_chunk, cmask, x_initial,
               context=None, context_mask=None):
        step = _make_step(params, context, context_mask, cmask, x_initial)
        (x, x_mean, key), _ = jax.lax.scan(step, (x, x_mean, key), t_chunk)
        return x, x_mean, key

    def chunked_sampler(params, key, condition=None, context=None,
                        context_mask=None):
        x, cmask, key = _init(params, key, condition, context, context_mask)
        x_initial = x
        x_mean = x
        timesteps = jnp.linspace(sde_sampler.T, eps, N)
        for i in range(N // chunk_size):
            t_chunk = timesteps[i * chunk_size : (i + 1) * chunk_size]
            x, x_mean, key = _chunk(params, x, x_mean, key, t_chunk, cmask,
                                    x_initial, context, context_mask)
            # Inter-chunk barrier via a scalar host transfer:
            # jax.block_until_ready does not guarantee completion on the axon
            # TPU tunnel, but fetching an element of the chunk's output does.
            np.asarray(x[(0,) * x.ndim])
        x_mean = jnp.where(cmask, x_mean, x_initial)
        mult = 2 if (guided and context is not None) else 1
        return (x_mean if denoise else x), N * (n_steps + 1) * mult

    return chunked_sampler


def get_sampling_fn(config, sde, model, shape, eps, num_steps=None,
                    chunk_size=None):
    """Config-driven sampler factory (`/root/reference/score_sde_pytorch/
    sampling.py:78-104`). `sampling.method: pc` (reference default) or
    `ode` (Heun probability-flow, diffusion/ode.py)."""
    method = str(config.sampling.get("method", "pc")).lower()
    if method == "hybrid":
        from .ode import get_hybrid_sampler

        if num_steps is not None:
            import warnings

            warnings.warn(
                "sampling.method=hybrid ignores num_steps — phase lengths "
                "come from sampling.hybrid_ode_steps/hybrid_pc_steps; the "
                "sampler's returned NFE reflects the actual trajectory",
                stacklevel=2)
        return get_hybrid_sampler(
            sde, model, shape,
            ode_steps=int(config.sampling.get("hybrid_ode_steps", 60)),
            pc_steps=int(config.sampling.get("hybrid_pc_steps", 170)),
            sigma_cross=float(config.sampling.get("hybrid_sigma_cross", 2.0)),
            snr=config.sampling.snr,
            n_steps=config.sampling.n_steps_each,
            denoise=config.sampling.noise_removal,
            eps=eps,
            cfg_scale=float(config.sampling.get("cfg_scale", 1.0)),
            chunk_size=chunk_size,
        )
    if method == "ode":
        if float(config.sampling.get("cfg_scale", 1.0)) != 1.0:
            raise NotImplementedError(
                "sampling.cfg_scale is only wired into the PC sampler; an "
                "ODE run would silently ignore guidance — use method: pc")
        from .ode import get_ode_sampler

        return get_ode_sampler(
            sde, model, shape, num_steps=num_steps or 100,
            denoise=config.sampling.noise_removal, eps=eps,
            final_langevin=int(config.sampling.get("ode_final_langevin", 10)),
            snr=config.sampling.snr,
            chunk_size=chunk_size,
        )
    n = num_steps or sde.N
    if chunk_size is None and n > 1000 and n % 1000 == 0:
        chunk_size = 1000  # long trajectories run as multiple launches
    return get_pc_sampler(
        sde=sde,
        model=model,
        shape=shape,
        predictor=config.sampling.predictor,
        corrector=config.sampling.corrector,
        snr=config.sampling.snr,
        n_steps=config.sampling.n_steps_each,
        probability_flow=config.sampling.probability_flow,
        denoise=config.sampling.noise_removal,
        eps=eps,
        num_steps=num_steps,
        chunk_size=chunk_size,
        cfg_scale=float(config.sampling.get("cfg_scale", 1.0)),
    )
