"""Analytic unit tests for the SDE core (SURVEY.md §4b)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from text2protein_tpu.diffusion.sde import VESDE, VPSDE, subVPSDE, get_sigmas


def test_vesde_marginal_prob():
    sde = VESDE(N=1000, sigma_min=0.01, sigma_max=100.0)
    x = jnp.ones((2, 4, 4, 1))
    t = jnp.array([0.0, 1.0])
    mean, std = sde.marginal_prob(x, t)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x))
    np.testing.assert_allclose(std[0], 0.01, rtol=1e-6)
    np.testing.assert_allclose(std[1], 100.0, rtol=1e-5)
    # geometric interpolation at t=0.5
    _, std_half = sde.marginal_prob(x, jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(std_half[0], math.sqrt(0.01 * 100.0), rtol=1e-5)


def test_vesde_discretize():
    sde = VESDE(N=2000, sigma_min=0.01, sigma_max=100.0)
    x = jnp.zeros((1, 4, 4, 1))
    # At timestep index k, G = sqrt(sigma_k^2 - sigma_{k-1}^2)
    t = jnp.array([1.0])
    f, G = sde.discretize(x, t)
    sigmas = np.exp(np.linspace(np.log(0.01), np.log(100.0), 2000))
    want = math.sqrt(sigmas[-1] ** 2 - sigmas[-2] ** 2)
    np.testing.assert_allclose(np.asarray(G)[0], want, rtol=1e-3)  # f32
    assert np.all(np.asarray(f) == 0)
    # at timestep 0, adjacent sigma is 0
    f0, G0 = sde.discretize(x, jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(G0)[0], sigmas[0], rtol=1e-5)


def test_vesde_prior():
    sde = VESDE(N=10, sigma_min=0.01, sigma_max=100.0)
    key = jax.random.PRNGKey(0)
    z = sde.prior_sampling(key, (4096, 4))
    assert abs(float(jnp.std(z)) - 100.0) / 100.0 < 0.05
    logp = sde.prior_logp(jnp.zeros((1, 4)))
    want = -4 / 2 * math.log(2 * math.pi * 100.0**2)
    np.testing.assert_allclose(np.asarray(logp)[0], want, rtol=1e-6)


def test_vpsde_marginal_prob():
    sde = VPSDE(N=1000, beta_min=0.1, beta_max=20.0)
    x = jnp.ones((1, 2, 2, 1))
    t = jnp.array([1.0])
    mean, std = sde.marginal_prob(x, t)
    log_mean_coeff = -0.25 * (20.0 - 0.1) - 0.5 * 0.1
    np.testing.assert_allclose(
        np.asarray(mean)[0, 0, 0, 0], math.exp(log_mean_coeff), rtol=1e-5
    )
    np.testing.assert_allclose(
        std[0], math.sqrt(1 - math.exp(2 * log_mean_coeff)), rtol=1e-5
    )


def test_vpsde_discretize_matches_ddpm():
    sde = VPSDE(N=1000, beta_min=0.1, beta_max=20.0)
    x = jnp.ones((1, 2, 2, 1))
    t = jnp.array([0.5])
    f, G = sde.discretize(x, t)
    k = int(0.5 * 999)
    betas = np.linspace(0.1 / 1000, 20.0 / 1000, 1000)
    np.testing.assert_allclose(np.asarray(G)[0], math.sqrt(betas[k]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f)[0, 0, 0, 0], math.sqrt(1 - betas[k]) - 1, rtol=1e-4
    )


def test_subvpsde_diffusion_zero_at_origin():
    sde = subVPSDE(N=100)
    x = jnp.ones((1, 2, 2, 1))
    _, diff = sde.sde(x, jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(diff)[0], 0.0, atol=1e-6)


def test_reverse_sde_drift():
    """Reverse drift must equal f - G^2 * score (G^2 * score / 2 for prob flow)."""
    sde = VESDE(N=100, sigma_min=0.01, sigma_max=100.0)

    def score_fn(x, t):
        return -x  # fake score

    x = jnp.full((2, 4, 4, 1), 3.0)
    t = jnp.array([0.7, 0.7])

    rsde = sde.reverse(score_fn, probability_flow=False)
    drift, diffusion = rsde.sde(x, t)
    f_fwd, g_fwd = sde.sde(x, t)
    want = np.asarray(f_fwd) - np.asarray(g_fwd)[:, None, None, None] ** 2 * (-3.0)
    np.testing.assert_allclose(np.asarray(drift), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(diffusion), np.asarray(g_fwd), rtol=1e-6)

    rode = sde.reverse(score_fn, probability_flow=True)
    drift_ode, diffusion_ode = rode.sde(x, t)
    want_ode = np.asarray(f_fwd) - np.asarray(g_fwd)[:, None, None, None] ** 2 * (-3.0) * 0.5
    np.testing.assert_allclose(np.asarray(drift_ode), want_ode, rtol=1e-5)
    assert np.all(np.asarray(diffusion_ode) == 0)


def test_sigma_ladder_descending():
    s = get_sigmas(0.01, 100.0, 2000)
    assert s[0] == np.float32(100.0)
    np.testing.assert_allclose(s[-1], 0.01, rtol=1e-5)
    assert np.all(np.diff(s) < 0)


def test_sde_jit_and_scan_compatible():
    """SDE objects must be closable under jit with no host callbacks."""
    sde = VESDE(N=100, sigma_min=0.01, sigma_max=100.0)

    @jax.jit
    def f(x, t):
        mean, std = sde.marginal_prob(x, t)
        f_, g_ = sde.discretize(x, t)
        return mean, std, f_, g_

    out = f(jnp.ones((2, 4, 4, 1)), jnp.array([0.3, 0.9]))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
