"""Forward/reverse SDEs (VE / VP / sub-VP), pure-JAX.

Same math as the reference (`/root/reference/score_sde_pytorch/sde_lib.py`),
re-designed functionally: SDE objects hold only static Python floats, so they
can be closed over by `jit`/`scan` with zero host round-trips. All methods take
and return jnp arrays; `t` is shaped (B,).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def bcast(v, ndim):
    """Broadcast a (B,) vector against a (B, ...) tensor of rank `ndim`."""
    return v.reshape(v.shape + (1,) * (ndim - 1))


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int) -> np.ndarray:
    """Geometric sigma ladder, DESCENDING (sigma_max first) — the model-side
    table (`/root/reference/score_sde_pytorch/models/utils.py:50-60`)."""
    return np.exp(
        np.linspace(math.log(sigma_max), math.log(sigma_min), num_scales)
    ).astype(np.float32)


@dataclass(frozen=True)
class SDE:
    """Base SDE. `N` is the number of discretization steps."""

    N: int

    @property
    def T(self) -> float:
        return 1.0

    def sde(self, x, t):
        raise NotImplementedError

    def marginal_prob(self, x, t):
        raise NotImplementedError

    def prior_sampling(self, key, shape):
        raise NotImplementedError

    def prior_logp(self, z):
        raise NotImplementedError

    def discretize(self, x, t):
        """Euler-Maruyama by default: x_{i+1} = x_i + f_i + G_i z_i."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        f = drift * dt
        G = diffusion * math.sqrt(dt)
        return f, G

    def reverse(self, score_fn, probability_flow: bool = False):
        """Reverse-time SDE/ODE with drift f - G^2 * score
        (`/root/reference/score_sde_pytorch/sde_lib.py:66-103`).

        `score_fn(x, t)` must already be context-bound (see sampling.py).
        """
        fwd = self

        class _Reverse:
            probability_flow_ = probability_flow

            @property
            def T(self_r):
                return fwd.T

            N = fwd.N

            def sde(self_r, x, t):
                drift, diffusion = fwd.sde(x, t)
                score = score_fn(x, t)
                mult = 0.5 if probability_flow else 1.0
                drift = drift - bcast(diffusion, x.ndim) ** 2 * score * mult
                diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
                return drift, diffusion

            def discretize(self_r, x, t):
                f, G = fwd.discretize(x, t)
                score = score_fn(x, t)
                mult = 0.5 if probability_flow else 1.0
                rev_f = f - bcast(G, x.ndim) ** 2 * score * mult
                rev_G = jnp.zeros_like(G) if probability_flow else G
                return rev_f, rev_G

        return _Reverse()


@dataclass(frozen=True)
class VPSDE(SDE):
    beta_min: float = 0.1
    beta_max: float = 20.0

    @property
    def discrete_betas(self):
        return jnp.linspace(self.beta_min / self.N, self.beta_max / self.N, self.N)

    @property
    def alphas(self):
        return 1.0 - self.discrete_betas

    @property
    def sqrt_1m_alphas_cumprod(self):
        return jnp.sqrt(1.0 - jnp.cumprod(self.alphas))

    def sde(self, x, t):
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        drift = -0.5 * bcast(beta_t, x.ndim) * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = (
            -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min
        )
        mean = jnp.exp(bcast(log_mean_coeff, x.ndim)) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        n = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z**2, axis=axes) / 2.0

    def discretize(self, x, t):
        """DDPM discretization."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        beta = self.discrete_betas[timestep]
        alpha = self.alphas[timestep]
        f = bcast(jnp.sqrt(alpha), x.ndim) * x - x
        G = jnp.sqrt(beta)
        return f, G


@dataclass(frozen=True)
class subVPSDE(SDE):
    beta_min: float = 0.1
    beta_max: float = 20.0

    def sde(self, x, t):
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        drift = -0.5 * bcast(beta_t, x.ndim) * x
        discount = 1.0 - jnp.exp(
            -2 * self.beta_min * t - (self.beta_max - self.beta_min) * t**2
        )
        diffusion = jnp.sqrt(beta_t * discount)
        return drift, diffusion

    def marginal_prob(self, x, t):
        log_mean_coeff = (
            -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min
        )
        mean = jnp.exp(bcast(log_mean_coeff, x.ndim)) * x
        std = 1.0 - jnp.exp(2.0 * log_mean_coeff)
        return mean, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        n = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(z**2, axis=axes) / 2.0


@dataclass(frozen=True)
class VESDE(SDE):
    sigma_min: float = 0.01
    sigma_max: float = 50.0

    @property
    def discrete_sigmas(self):
        """ASCENDING sigma ladder used by the SMLD discretization
        (`/root/reference/score_sde_pytorch/sde_lib.py:210`)."""
        return jnp.exp(
            jnp.linspace(math.log(self.sigma_min), math.log(self.sigma_max), self.N)
        )

    def sde(self, x, t):
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        drift = jnp.zeros_like(x)
        diffusion = sigma * math.sqrt(
            2 * (math.log(self.sigma_max) - math.log(self.sigma_min))
        )
        return drift, diffusion

    def marginal_prob(self, x, t):
        std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return x, std

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape) * self.sigma_max

    def prior_logp(self, z):
        n = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * math.log(2 * math.pi * self.sigma_max**2) - jnp.sum(
            z**2, axis=axes
        ) / (2 * self.sigma_max**2)

    def discretize(self, x, t):
        """SMLD (NCSN) discretization: G = sqrt(sigma_t^2 - sigma_{t-1}^2)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigmas = self.discrete_sigmas
        sigma = sigmas[timestep]
        adjacent_sigma = jnp.where(
            timestep == 0, jnp.zeros_like(t), sigmas[timestep - 1]
        )
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma**2 - adjacent_sigma**2)
        return f, G


def get_sde(config):
    """Build the SDE + sampling_eps named by the config
    (`/root/reference/train.py:131-140`)."""
    name = config.training.sde.lower()
    if name == "vesde":
        sde = VESDE(
            N=config.model.num_scales,
            sigma_min=config.model.sigma_min,
            sigma_max=config.model.sigma_max,
        )
        eps = 1e-5
    elif name == "vpsde":
        sde = VPSDE(
            N=config.model.num_scales,
            beta_min=config.model.beta_min,
            beta_max=config.model.beta_max,
        )
        eps = 1e-3
    elif name == "subvpsde":
        sde = subVPSDE(
            N=config.model.num_scales,
            beta_min=config.model.beta_min,
            beta_max=config.model.beta_max,
        )
        eps = 1e-3
    else:
        raise NotImplementedError(f"SDE {name} unknown.")
    return sde, eps
