"""Score UNet: shapes, determinism, scale_by_sigma, topology invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from text2protein_tpu.models import build_model
from text2protein_tpu.models.layers import get_timestep_embedding
from helpers import tiny_config, tiny_batch


def _init(config, batch):
    model = build_model(config)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["coords_6d"],
        jnp.zeros((batch["coords_6d"].shape[0],)),
        context=batch.get("context"),
        context_mask=batch.get("context_mask"),
        train=False,
    )
    return model, variables["params"]


def test_forward_shape_and_determinism():
    config = tiny_config()
    batch = tiny_batch(config)
    model, params = _init(config, batch)
    t = jnp.array([0.0, 3.0])
    out1 = model.apply(
        {"params": params}, batch["coords_6d"], t,
        context=batch["context"], context_mask=batch["context_mask"],
    )
    out2 = model.apply(
        {"params": params}, batch["coords_6d"], t,
        context=batch["context"], context_mask=batch["context_mask"],
    )
    assert out1.shape == batch["coords_6d"].shape
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_scale_by_sigma():
    """Output at label k must equal the unscaled output divided by sigmas[k]."""
    config = tiny_config()
    config.model.scale_by_sigma = True
    batch = tiny_batch(config)
    model, params = _init(config, batch)

    config2 = tiny_config()
    config2.model.scale_by_sigma = False
    from text2protein_tpu.models import build_model as bm

    model2 = bm(config2)

    t = jnp.array([2.0, 5.0])
    scaled = model.apply(
        {"params": params}, batch["coords_6d"], t,
        context=batch["context"], context_mask=batch["context_mask"],
    )
    unscaled = model2.apply(
        {"params": params}, batch["coords_6d"], t,
        context=batch["context"], context_mask=batch["context_mask"],
    )
    from text2protein_tpu.diffusion.sde import get_sigmas

    sig = get_sigmas(config.model.sigma_min, config.model.sigma_max,
                     config.model.num_scales)
    want = np.asarray(unscaled) / sig[np.array([2, 5])][:, None, None, None]
    np.testing.assert_allclose(np.asarray(scaled), want, rtol=1e-5, atol=1e-6)


def test_timestep_embedding_matches_reference_formula():
    import math

    t = jnp.array([0.0, 1.0, 17.5])
    dim = 6
    emb = np.asarray(get_timestep_embedding(t, dim))
    half = dim // 2
    freq = np.exp(np.arange(half) * -(math.log(10000) / (half - 1)))
    args = np.asarray(t)[:, None] * freq[None, :]
    want = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    np.testing.assert_allclose(emb, want, rtol=1e-5, atol=1e-6)


def test_works_without_context():
    config = tiny_config()
    batch = tiny_batch(config, with_context=False)
    model, params = _init(config, batch)
    out = model.apply(
        {"params": params}, batch["coords_6d"], jnp.zeros((2,))
    )
    assert out.shape == batch["coords_6d"].shape


def test_context_mask_excludes_padding():
    """Changing embeddings under masked-out caption positions must not change
    the output (the reference attends to pad tokens; we must not)."""
    config = tiny_config()
    batch = tiny_batch(config)
    model, params = _init(config, batch)
    t = jnp.zeros((2,))
    out1 = model.apply(
        {"params": params}, batch["coords_6d"], t,
        context=batch["context"], context_mask=batch["context_mask"],
    )
    ctx2 = np.asarray(batch["context"]).copy()
    ctx2[:, 5:] = 123.0  # masked positions
    out2 = model.apply(
        {"params": params}, batch["coords_6d"], t,
        context=jnp.asarray(ctx2), context_mask=batch["context_mask"],
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_eight_channel_model():
    config = tiny_config(data={"num_channels": 8})
    batch = tiny_batch(config)
    model, params = _init(config, batch)
    out = model.apply(
        {"params": params}, batch["coords_6d"], jnp.zeros((2,)),
        context=batch["context"], context_mask=batch["context_mask"],
    )
    assert out.shape[-1] == 8


def test_groupnorm_f32stats_matches_flax():
    """The f32-stats/bf16-traffic GroupNorm must match flax GroupNorm on f32
    inputs and stay accurate on bf16 inputs."""
    import flax.linen as nn
    from text2protein_tpu.models.layers import GroupNormF32Stats

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16)) * 3 + 1.5
    ours = GroupNormF32Stats(num_groups=4, epsilon=1e-6)
    ref = nn.GroupNorm(num_groups=4, epsilon=1e-6, dtype=jnp.float32)
    p1 = ours.init(jax.random.PRNGKey(1), x)
    p2 = ref.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(ours.apply(p1, x)), np.asarray(ref.apply(p2, x)),
        atol=1e-5,
    )
    # bf16 input + follow_input_dtype: output bf16, values close to f32 ref
    from text2protein_tpu.models.layers import GroupNormF32Stats as GN

    ours_bf16 = GN(num_groups=4, epsilon=1e-6, follow_input_dtype=True)
    xb = x.astype(jnp.bfloat16)
    yb = ours_bf16.apply(p1, xb)
    assert yb.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(yb, dtype=np.float32), np.asarray(ref.apply(p2, x)),
        atol=0.05,
    )
    # param naming matches flax (checkpoint compatibility)
    assert set(p1["params"].keys()) == {"scale", "bias"}


def test_norm_dtype_model_close_to_f32():
    config = tiny_config()
    batch = tiny_batch(config)
    model, params = _init(config, batch)
    import text2protein_tpu.models.unet as unet_mod

    config2 = tiny_config()
    config2.model.norm_dtype = "bfloat16"
    config2.model.dtype = "bfloat16"
    model2 = unet_mod.build_model(config2)
    t = jnp.array([1.0, 4.0])
    out1 = model.apply({"params": params}, batch["coords_6d"], t,
                       context=batch["context"],
                       context_mask=batch["context_mask"])
    out2 = model2.apply({"params": params}, batch["coords_6d"], t,
                        context=batch["context"],
                        context_mask=batch["context_mask"])
    # same params usable by both variants; outputs close at bf16 tolerance
    err = np.abs(np.asarray(out1) - np.asarray(out2)).max()
    scale = np.abs(np.asarray(out1)).max() + 1e-6
    assert err / scale < 0.1, (err, scale)
