"""DDIM sampler with classifier-free guidance + epsilon-prediction loss.

Parity with the reference's alternate sampler family
(`/root/reference/sampler/diffusion_sampler.py` ~= `model/diffusion_sampler.py`,
used by the scratch script play.py): linear/cosine/sqrt beta schedules
(`/root/reference/model/ldm_utils.py:21-43`), eta-parameterized DDIM reverse
loop, guidance weight `w`: eps = w * model(x, t, ctx) + (1 - w) * model(x, t, 0)
(`diffusion_sampler.py:125-128`), and l1/l2 epsilon-prediction training loss.
Implemented as one `lax.scan` instead of a host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(schedule: str, n_timestep: int, linear_start=1e-4,
                       linear_end=2e-2, cosine_s=8e-3) -> np.ndarray:
    """`/root/reference/model/ldm_utils.py:21-43`."""
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
        )
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas.astype(np.float64)


class DDIMSampler:
    """Epsilon-prediction DDIM with guidance. `model.apply(variables, x,
    t_labels, context=...)` must return the predicted noise."""

    def __init__(self, model, n_timestep=1000, schedule="linear",
                 linear_start=1e-4, linear_end=2e-2):
        self.model = model
        self.n_timestep = n_timestep
        betas = make_beta_schedule(schedule, n_timestep, linear_start, linear_end)
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas))
        self.sqrt_ac = jnp.sqrt(self.alphas_cumprod)
        self.sqrt_1m_ac = jnp.sqrt(1.0 - self.alphas_cumprod)

    def _eps(self, params, x, t, context, context_mask, w):
        def call(ctx):
            return self.model.apply(
                {"params": params}, x, t.astype(jnp.float32),
                context=ctx, context_mask=context_mask, train=False,
            )

        if context is None or w == 1.0:
            return call(context)
        # classifier-free guidance: w * cond + (1 - w) * uncond(zeroed ctx)
        # (`diffusion_sampler.py:125-128`); w=1 -> plain conditional.
        return w * call(context) + (1.0 - w) * call(jnp.zeros_like(context))

    def q_sample(self, x0, t, noise):
        a = self.sqrt_ac[t].reshape(-1, *([1] * (x0.ndim - 1)))
        s = self.sqrt_1m_ac[t].reshape(-1, *([1] * (x0.ndim - 1)))
        return a * x0 + s * noise

    def p_loss(self, params, x0, rng, context=None, context_mask=None,
               loss_type="l2", w=1.0):
        """Epsilon-prediction loss (`diffusion_sampler.py:150-163`)."""
        k_t, k_z = jax.random.split(rng)
        b = x0.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.n_timestep)
        noise = jax.random.normal(k_z, x0.shape)
        x_t = self.q_sample(x0, t, noise)
        eps = self._eps(params, x_t, t, context, context_mask, w)
        if loss_type == "l1":
            return jnp.mean(jnp.abs(eps - noise))
        return jnp.mean((eps - noise) ** 2)

    @partial(jax.jit, static_argnames=("self", "shape", "ddim_steps", "w", "eta"))
    def sample(self, params, key, shape, context=None, context_mask=None,
               ddim_steps=50, eta=0.0, w=1.0):
        """DDIM reverse loop as one scan (`diffusion_sampler.py:72-114`)."""
        step_idx = jnp.linspace(
            self.n_timestep - 1, 0, ddim_steps
        ).round().astype(jnp.int32)
        prev_idx = jnp.concatenate([step_idx[1:], jnp.array([-1])])

        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape)

        def body(carry, inp):
            x, key = carry
            t, t_prev = inp
            key, kz = jax.random.split(key)
            vec_t = jnp.full((shape[0],), t)
            eps = self._eps(params, x, vec_t, context, context_mask, w)
            a_t = self.alphas_cumprod[t]
            a_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[t_prev], 1.0)
            x0_pred = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            sigma = (
                eta
                * jnp.sqrt((1 - a_prev) / (1 - a_t))
                * jnp.sqrt(1 - a_t / a_prev)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma**2, 0.0)) * eps
            noise = sigma * jax.random.normal(kz, x.shape)
            x = jnp.sqrt(a_prev) * x0_pred + dir_xt + noise
            return (x, key), None

        (x, _), _ = jax.lax.scan(body, (x, key), (step_idx, prev_idx))
        return x
