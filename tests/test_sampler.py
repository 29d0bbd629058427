"""PC sampler: analytic-score distributional test + conditioning invariants
(SURVEY.md §4c/d — the clamp spec of sampling.py:283-285)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from text2protein_tpu.diffusion.sde import VESDE, get_sigmas
from text2protein_tpu.diffusion.sampling import get_pc_sampler, apply_condition


class AnalyticGaussianScoreModel:
    """Fake 'model' with the VESDE label convention: given labels indexing the
    DESCENDING sigma ladder, return the exact score of N(0, s0^2) data
    perturbed by sigma: score(x) = -x / (s0^2 + sigma^2)."""

    def __init__(self, s0, sigma_min, sigma_max, num_scales):
        self.s0 = s0
        self.sigmas = jnp.asarray(get_sigmas(sigma_min, sigma_max, num_scales))

    def apply(self, variables, x, labels, context=None, context_mask=None,
              train=False, rngs=None):
        sigma = self.sigmas[labels.astype(jnp.int32)]
        var = self.s0**2 + sigma**2
        return -x / var.reshape(-1, *([1] * (x.ndim - 1)))


def test_pc_sampler_matches_analytic_gaussian():
    s0 = 0.5
    sde = VESDE(N=200, sigma_min=0.01, sigma_max=20.0)
    model = AnalyticGaussianScoreModel(s0, 0.01, 20.0, 200)
    shape = (16, 8, 8, 2)
    sampler = get_pc_sampler(
        sde, model, shape, snr=0.17, n_steps=1, denoise=True, eps=1e-5
    )
    samples, nfe = sampler({}, jax.random.PRNGKey(0))
    assert nfe == 200 * 2
    samples = np.asarray(samples)
    assert samples.shape == shape
    std = samples.std()
    assert abs(std - s0) / s0 < 0.15, f"sample std {std} vs expected {s0}"
    assert abs(samples.mean()) < 0.1


def test_conditioning_clamped_bit_exact():
    """Conditioned entries must equal x_initial exactly after sampling."""
    s0 = 1.0
    sde = VESDE(N=50, sigma_min=0.01, sigma_max=10.0)
    model = AnalyticGaussianScoreModel(s0, 0.01, 10.0, 50)
    b, n, c = 4, 8, 5
    shape = (b, n, n, c)

    lengths = np.array([4, 6, 8, 5])
    v = np.zeros((b, n, n), dtype=bool)
    for i, l in enumerate(lengths):
        v[i, :l, :l] = True
    condition = {"length": jnp.asarray(v)}

    sampler = get_pc_sampler(sde, model, shape, snr=0.17, n_steps=1, denoise=True)
    samples, _ = sampler({}, jax.random.PRNGKey(1), condition=condition)
    samples = np.asarray(samples)

    # mask channel == the length mask everywhere
    np.testing.assert_array_equal(samples[..., -1], v.astype(np.float32))
    # outside the length square, every channel is exactly 0 (x_initial = x*v)
    assert np.all(samples[~v] == 0.0)
    # inside, non-mask channels actually evolved
    assert np.abs(samples[v][:, :-1]).mean() > 0.01


def test_apply_condition_ss_and_inpainting():
    b, n, c = 2, 8, 8
    x = jnp.ones((b, n, n, c)) * 9.0
    ss = jnp.full((b, n, n, 3), 0.5)
    x2, cm = apply_condition(x, {"ss": ss})
    assert np.all(np.asarray(x2)[..., 4:7] == 0.5)
    assert not np.asarray(cm)[..., 4:7].any()

    coords = jnp.full((b, n, n, c), -3.0)
    mask_inp = jnp.zeros((b, n, n), bool).at[:, :3, :3].set(True)
    x3, cm3 = apply_condition(
        x, {"inpainting": {"coords_6d": coords, "mask_inpaint": mask_inp}}
    )
    x3 = np.asarray(x3)
    assert np.all(x3[:, :3, :3, :] == 9.0)      # free region keeps prior
    assert np.all(x3[:, 4:, 4:, :] == -3.0)     # clamped region = coords_6d


def test_probability_flow_deterministic_given_key():
    sde = VESDE(N=20, sigma_min=0.01, sigma_max=10.0)
    model = AnalyticGaussianScoreModel(1.0, 0.01, 10.0, 20)
    shape = (2, 8, 8, 2)
    sampler = get_pc_sampler(
        sde, model, shape, corrector="none", probability_flow=True, denoise=True
    )
    s1, _ = sampler({}, jax.random.PRNGKey(5))
    s2, _ = sampler({}, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_langevin_snr_step_size():
    """One Langevin step with a constant score must apply
    step = 2*(snr*||z||/||grad||)^2 (alpha=1 for VESDE)."""
    from text2protein_tpu.diffusion.sampling import LangevinCorrector

    sde = VESDE(N=10, sigma_min=0.01, sigma_max=10.0)
    g = 2.0

    def score_fn(x, t):
        return jnp.full_like(x, g)

    corr = LangevinCorrector(sde, score_fn, snr=0.17, n_steps=1)
    x = jnp.zeros((4, 8, 8, 1))
    key = jax.random.PRNGKey(0)
    x_new, x_mean = corr.update_fn(key, x, jnp.full((4,), 0.5))
    # step size: grad_norm = g * sqrt(D); noise_norm ~ sqrt(D)
    d = 8 * 8
    expected_step = (0.17 * 1.0 / g) ** 2 * 2  # noise_norm/grad_norm ~ 1/g
    got_step = float(np.asarray(x_mean).mean() / g)
    assert abs(got_step - expected_step) / expected_step < 0.25


def test_num_steps_override_consistent_noise_schedule():
    """With num_steps < sde.N, the sampler's re-discretized SDE must inject
    total noise variance matching the prior (sum of G^2 over steps ~
    sigma_max^2), and the analytic-score result must stay correct."""
    s0 = 0.5
    sde = VESDE(N=2000, sigma_min=0.01, sigma_max=20.0)
    model = AnalyticGaussianScoreModel(s0, 0.01, 20.0, 2000)
    shape = (16, 8, 8, 2)
    sampler = get_pc_sampler(
        sde, model, shape, snr=0.17, n_steps=1, denoise=True, eps=1e-5,
        num_steps=200,
    )
    samples, nfe = sampler({}, jax.random.PRNGKey(0))
    assert nfe == 400
    std = float(np.asarray(samples).std())
    assert abs(std - s0) / s0 < 0.15, std

    # G^2 accumulated over the sampler ladder covers the prior variance
    import dataclasses
    import jax.numpy as jnp

    sub = dataclasses.replace(sde, N=200)
    ts = jnp.linspace(1.0, 1e-5, 200)
    total = 0.0
    for t in np.asarray(ts):
        _, G = sub.discretize(jnp.zeros((1, 2, 2, 1)), jnp.array([t]))
        total += float(G[0]) ** 2
    assert abs(total - 20.0**2) / 20.0**2 < 0.05, total


def test_chunked_sampler_matches_single_launch():
    """chunk_size splits the trajectory into several launches with identical
    math: same key -> same samples as the single-scan sampler."""
    sde = VESDE(N=40, sigma_min=0.01, sigma_max=10.0)
    model = AnalyticGaussianScoreModel(1.0, 0.01, 10.0, 40)
    shape = (2, 8, 8, 5)
    v = jnp.zeros((2, 8, 8), bool).at[:, :6, :6].set(True)
    condition = {"length": v}
    kwargs = dict(snr=0.17, n_steps=1, denoise=True, eps=1e-5)
    s_one = get_pc_sampler(sde, model, shape, **kwargs)
    s_chunked = get_pc_sampler(sde, model, shape, chunk_size=10, **kwargs)
    out1, nfe1 = s_one({}, jax.random.PRNGKey(3), condition=condition)
    out2, nfe2 = s_chunked({}, jax.random.PRNGKey(3), condition=condition)
    assert nfe1 == nfe2 == 80
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_ode_sampler_matches_analytic_gaussian():
    """Heun probability-flow ODE at 60 steps must hit the analytic Gaussian
    target distribution (the PC chain needs ~200 stochastic steps)."""
    from text2protein_tpu.diffusion.ode import get_ode_sampler

    s0 = 0.5
    sde = VESDE(N=2000, sigma_min=0.01, sigma_max=20.0)
    model = AnalyticGaussianScoreModel(s0, 0.01, 20.0, 2000)
    shape = (32, 8, 8, 2)
    sampler = get_ode_sampler(sde, model, shape, num_steps=60)
    out, nfe = sampler({}, jax.random.PRNGKey(0))
    assert nfe == 121  # 60 Heun steps x2 + terminal Tweedie denoise
    out = np.asarray(out)
    std = out.std()
    assert abs(std - s0) / s0 < 0.12, std
    assert abs(out.mean()) < 0.05
    # deterministic given the key
    out2, _ = sampler({}, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(out, np.asarray(out2))


def test_ode_sampler_conditioning_clamp():
    from text2protein_tpu.diffusion.ode import get_ode_sampler

    sde = VESDE(N=100, sigma_min=0.01, sigma_max=10.0)
    model = AnalyticGaussianScoreModel(1.0, 0.01, 10.0, 100)
    b, n, c = 2, 8, 5
    v = np.zeros((b, n, n), bool)
    v[:, :5, :5] = True
    sampler = get_ode_sampler(sde, model, (b, n, n, c), num_steps=20)
    out, _ = sampler({}, jax.random.PRNGKey(1),
                     condition={"length": jnp.asarray(v)})
    out = np.asarray(out)
    np.testing.assert_array_equal(out[..., -1], v.astype(np.float32))
    assert np.all(out[~v] == 0.0)


def test_pick_chunk_divides_steps():
    from text2protein_tpu.diffusion.sampling import pick_chunk

    assert pick_chunk(1000, 1000) is None          # single launch fits
    assert pick_chunk(2000, 1000) == 1000
    assert pick_chunk(1000, 100) == 100
    assert pick_chunk(250, 100) == 50              # largest divisor <= target
    assert pick_chunk(1500, 1000) == 750
    for steps in (600, 750, 1200, 1999):
        c = pick_chunk(steps, 500)
        if c is not None:
            assert steps % c == 0 and c <= 500


class ContextShiftedGaussianScoreModel(AnalyticGaussianScoreModel):
    """Score of N(mu, s0^2) data where mu is read off the context embedding
    (mu = context mean); null context (zeros) recovers the centered model, so
    CFG at scale w should sample around w*mu."""

    def apply(self, variables, x, labels, context=None, context_mask=None,
              train=False, rngs=None):
        sigma = self.sigmas[labels.astype(jnp.int32)]
        var = self.s0**2 + sigma**2
        mu = 0.0 if context is None else jnp.mean(context)
        return -(x - mu) / var.reshape(-1, *([1] * (x.ndim - 1)))


def test_cfg_scale_shifts_mean_and_doubles_nfe():
    """CFG: score = w*s(x,ctx) + (1-w)*s(x,0). For the context-shifted
    Gaussian this equals the score of N(w*mu, var), so samples must center at
    w*mu; NFE doubles when guidance is active."""
    s0, mu, w = 0.5, 2.0, 2.0
    sde = VESDE(N=200, sigma_min=0.01, sigma_max=20.0)
    model = ContextShiftedGaussianScoreModel(s0, 0.01, 20.0, 200)
    shape = (16, 8, 8, 2)
    context = jnp.full((16, 4, 8), mu)

    plain = get_pc_sampler(sde, model, shape, snr=0.17, n_steps=1)
    s1, nfe1 = plain({}, jax.random.PRNGKey(0), context=context)
    assert nfe1 == 200 * 2
    assert abs(np.asarray(s1).mean() - mu) < 0.1

    guided = get_pc_sampler(sde, model, shape, snr=0.17, n_steps=1,
                            cfg_scale=w)
    s2, nfe2 = guided({}, jax.random.PRNGKey(0), context=context)
    assert nfe2 == 200 * 2 * 2
    assert abs(np.asarray(s2).mean() - w * mu) < 0.15

    # without context, a guided sampler degrades to the plain one (nfe too)
    s3, nfe3 = guided({}, jax.random.PRNGKey(0))
    assert nfe3 == 200 * 2
    assert abs(np.asarray(s3).mean()) < 0.1


def test_hybrid_sampler_matches_analytic_gaussian():
    """ODE head + PC tail must hit the analytic Gaussian target, at the
    documented NFE (2*ode_steps + pc_steps*(n_steps+1))."""
    from text2protein_tpu.diffusion.ode import get_hybrid_sampler

    s0 = 0.5
    sde = VESDE(N=2000, sigma_min=0.01, sigma_max=20.0)
    model = AnalyticGaussianScoreModel(s0, 0.01, 20.0, 2000)
    shape = (32, 8, 8, 2)
    sampler = get_hybrid_sampler(sde, model, shape, ode_steps=30,
                                 pc_steps=60, sigma_cross=2.0)
    out, nfe = sampler({}, jax.random.PRNGKey(0))
    assert nfe == 2 * 30 + 60 * 2
    out = np.asarray(out)
    std = out.std()
    assert abs(std - s0) / s0 < 0.15, std
    assert abs(out.mean()) < 0.1


def test_hybrid_sampler_conditioning_clamp():
    from text2protein_tpu.diffusion.ode import get_hybrid_sampler

    sde = VESDE(N=100, sigma_min=0.01, sigma_max=10.0)
    model = AnalyticGaussianScoreModel(1.0, 0.01, 10.0, 100)
    b, n, c = 2, 8, 5
    v = np.zeros((b, n, n), bool)
    v[0, :4, :4] = True
    v[1, :6, :6] = True
    condition = {"length": jnp.asarray(v)}
    sampler = get_hybrid_sampler(sde, model, (b, n, n, c), ode_steps=10,
                                 pc_steps=20, sigma_cross=1.0)
    out, _ = sampler({}, jax.random.PRNGKey(1), condition=condition)
    out = np.asarray(out)
    # same clamp contract as the PC sampler: mask channel == the length
    # mask everywhere; everything outside the length square exactly 0
    np.testing.assert_array_equal(out[..., -1], np.asarray(v, np.float32))
    assert np.all(out[~v] == 0.0)
    assert np.abs(out[v][:, :-1]).mean() > 0.01


def test_chunked_hybrid_matches_single_launch():
    """chunk_size splits both hybrid phases into several launches with
    identical math and RNG threading: same key -> same samples (phase
    boundaries land mid-chunk: 14 does not divide ode_steps=10+pc_steps=20)."""
    from text2protein_tpu.diffusion.ode import get_hybrid_sampler

    sde = VESDE(N=100, sigma_min=0.01, sigma_max=10.0)
    model = AnalyticGaussianScoreModel(1.0, 0.01, 10.0, 100)
    b, n, c = 2, 8, 5
    v = jnp.zeros((b, n, n), bool).at[:, :6, :6].set(True)
    condition = {"length": v}
    kwargs = dict(ode_steps=10, pc_steps=20, sigma_cross=1.0)
    s_one = get_hybrid_sampler(sde, model, (b, n, n, c), **kwargs)
    s_chunked = get_hybrid_sampler(sde, model, (b, n, n, c), chunk_size=14,
                                   **kwargs)
    out1, nfe1 = s_one({}, jax.random.PRNGKey(5), condition=condition)
    out2, nfe2 = s_chunked({}, jax.random.PRNGKey(5), condition=condition)
    assert nfe1 == nfe2 == 2 * 10 + 20 * 2
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_sampling_fn_factory_hybrid_with_chunking():
    """`sampling.method: hybrid` through the config factory honors the
    hybrid_* keys and forwards chunk_size (previously dropped)."""
    from text2protein_tpu.config import load_config
    from text2protein_tpu.diffusion.sampling import get_sampling_fn

    config = load_config("configs/quality_l128.yml")
    config.sampling.method = "hybrid"
    config.sampling.hybrid_ode_steps = 6
    config.sampling.hybrid_pc_steps = 10
    sde = VESDE(N=100, sigma_min=0.01, sigma_max=10.0)
    model = AnalyticGaussianScoreModel(1.0, 0.01, 10.0, 100)
    shape = (2, 8, 8, 5)
    s = get_sampling_fn(config, sde, model, shape, 1e-5, chunk_size=4)
    s1 = get_sampling_fn(config, sde, model, shape, 1e-5)
    out, nfe = s({}, jax.random.PRNGKey(2))
    out1, nfe1 = s1({}, jax.random.PRNGKey(2))
    assert nfe == nfe1 == 2 * 6 + 10 * 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(out1),
                               atol=1e-5, rtol=1e-5)


def test_chunked_ode_matches_single_launch():
    """get_ode_sampler's chunk_size splits the Heun trajectory (and runs the
    final Langevin + Tweedie in a last launch) with identical math and RNG
    threading; the chunk is snapped to a divisor of num_steps."""
    from text2protein_tpu.diffusion.ode import get_ode_sampler

    sde = VESDE(N=100, sigma_min=0.01, sigma_max=10.0)
    model = AnalyticGaussianScoreModel(1.0, 0.01, 10.0, 100)
    b, n, c = 2, 8, 5
    v = jnp.zeros((b, n, n), bool).at[:, :6, :6].set(True)
    condition = {"length": v}
    kwargs = dict(num_steps=20, final_langevin=3)
    s_one = get_ode_sampler(sde, model, (b, n, n, c), **kwargs)
    # 7 is not a divisor of 20 -> snapped to 5 by pick_chunk
    s_chunked = get_ode_sampler(sde, model, (b, n, n, c), chunk_size=7,
                                **kwargs)
    out1, nfe1 = s_one({}, jax.random.PRNGKey(4), condition=condition)
    out2, nfe2 = s_chunked({}, jax.random.PRNGKey(4), condition=condition)
    assert nfe1 == nfe2 == 2 * 20 + 3 + 1
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_hybrid_cfg_doubles_nfe():
    """Under classifier-free guidance every hybrid score eval calls the model
    twice, so the reported NFE must double (get_pc_sampler's convention)."""
    from text2protein_tpu.diffusion.ode import get_hybrid_sampler

    s0, mu, w = 0.5, 2.0, 2.0
    sde = VESDE(N=200, sigma_min=0.01, sigma_max=20.0)
    model = ContextShiftedGaussianScoreModel(s0, 0.01, 20.0, 200)
    shape = (16, 8, 8, 2)
    context = jnp.full((16, 4, 8), mu)
    kwargs = dict(ode_steps=10, pc_steps=20, sigma_cross=1.0)

    guided = get_hybrid_sampler(sde, model, shape, cfg_scale=w, **kwargs)
    out, nfe = guided({}, jax.random.PRNGKey(0), context=context)
    assert nfe == (2 * 10 + 20 * 2) * 2
    assert abs(np.asarray(out).mean() - w * mu) < 0.2

    # without context, guidance (and the NFE doubling) is inactive
    out0, nfe0 = guided({}, jax.random.PRNGKey(0))
    assert nfe0 == 2 * 10 + 20 * 2

    # the chunked variant reports the same guided NFE
    chunked = get_hybrid_sampler(sde, model, shape, cfg_scale=w,
                                 chunk_size=8, **kwargs)
    outc, nfec = chunked({}, jax.random.PRNGKey(0), context=context)
    assert nfec == (2 * 10 + 20 * 2) * 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(outc),
                               atol=1e-5, rtol=1e-5)
