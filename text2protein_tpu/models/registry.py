"""Model registry + DDPM parameter helper.

Parity with `/root/reference/score_sde_pytorch/models/utils.py:24-94`: the
decorator registry (which the reference's real path bypasses by hardcoding
UNetModel — here `build_model` actually consults it) and `get_ddpm_params`.
"""

from __future__ import annotations

import numpy as np

_MODELS = {}


def register_model(cls=None, *, name=None):
    def _register(c):
        local = name or c.__name__
        if local in _MODELS:
            raise ValueError(f"Already registered model with name: {local}")
        _MODELS[local] = c
        return c

    return _register if cls is None else _register(cls)


def get_model(name: str):
    return _MODELS[name]


def get_ddpm_params(config):
    """Betas/alphas of the original DDPM parameterization
    (`models/utils.py:63-85`)."""
    num_diffusion_timesteps = 1000
    beta_start = config.model.beta_min / config.model.num_scales
    beta_end = config.model.beta_max / config.model.num_scales
    betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps,
                        dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    return {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "beta_min": beta_start * (num_diffusion_timesteps - 1),
        "beta_max": beta_end * (num_diffusion_timesteps - 1),
        "num_diffusion_timesteps": num_diffusion_timesteps,
    }
