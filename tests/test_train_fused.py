"""On-device train-time featurization + fused multi-step launches.

The reference ships host-featurized (C, N, N) maps to the device every step
(`/root/reference/dataset.py` collate -> `train.py:174`); over a narrow
host<->device link that transfer dominates. These tests pin the TPU-native
replacements: `featurize_batch_jax` must reproduce the host featurizer
bit-for-bit (up to f32), and `make_multi_train_step` (K steps per launch via
lax.scan) must match K calls of the single-step path exactly.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from text2protein_tpu.config import load_config  # noqa: E402
from text2protein_tpu.data.featurize import featurize_batch_jax  # noqa: E402
from text2protein_tpu.data.synthetic import helix_bundle_dataset  # noqa: E402
from text2protein_tpu.diffusion import get_sde  # noqa: E402
from text2protein_tpu.models import build_model  # noqa: E402
from text2protein_tpu.training import (  # noqa: E402
    create_train_state,
    make_train_step,
    make_multi_train_step,
)


def _tiny_config(featurize_on_device=True):
    return load_config({
        "training": {"sde": "vesde", "batch_size": 2},
        "data": {"min_res_num": 8, "max_res_num": 16, "num_channels": 5,
                 "featurize_on_device": featurize_on_device},
        "model": {"condition": ["length"], "nf": 8, "ch_mult": [1, 2],
                  "num_res_blocks": 1, "attn_resolutions": [8],
                  "n_heads": 2, "context_dim": 16, "dropout": 0.0},
        "optim": {"warmup": 2},
        "seed": 0,
    })


def _light_batch(b=2, n=16, seed=0):
    recs = helix_bundle_dataset(b, n, seed=seed)
    bb = np.zeros((b, n, 3, 3), np.float32)
    mask = np.zeros((b, n), bool)
    lengths = np.zeros((b,), np.int32)
    gt = np.zeros((b, n, n, 5), np.float32)
    for i, r in enumerate(recs):
        L = r["L"]
        bb[i, :L] = r["bb"]
        mask[i, :L] = True
        lengths[i] = L
        gt[i, :L, :L] = r["coords_6d"].transpose(1, 2, 0)
    batch = {
        "bb": jnp.asarray(bb),
        "mask_res": jnp.asarray(mask),
        "ss_spans": jnp.full((b, 4, 2), -1, jnp.int32),
        "length": jnp.asarray(lengths),
        "context": jnp.asarray(
            np.random.RandomState(seed).randn(b, 4, 16).astype(np.float32)
        ),
        "context_mask": jnp.asarray(np.ones((b, 4), bool)),
    }
    return batch, gt, mask


def test_featurize_batch_jax_matches_host():
    """Device featurization == host `featurize_structure` output (the host
    computes in float64; 2e-5 covers the f32 difference)."""
    batch, gt, mask = _light_batch(b=3, n=24, seed=1)
    c6d, mp = featurize_batch_jax(batch["bb"][:3], batch["mask_res"][:3], 5)
    np.testing.assert_allclose(np.asarray(c6d), gt[:3], atol=2e-5)
    expect_mp = mask[:, :, None] & mask[:, None, :]
    assert (np.asarray(mp) == expect_mp[:3]).all()
    assert np.isfinite(np.asarray(c6d)).all()


def test_multi_step_matches_k_single_steps():
    """One K-step fused launch == K single-step launches, bit-for-bit, when
    fed the same per-step keys (multi_step splits its rng exactly like the
    test does here)."""
    config = _tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    k = 3
    batches = [_light_batch(seed=s)[0] for s in range(k)]

    state0 = create_train_state(config, model, jax.random.PRNGKey(0),
                                batches[0])
    single = make_train_step(config, sde, model, donate=False)
    multi = make_multi_train_step(config, sde, model, donate=False)

    rng = jax.random.PRNGKey(42)
    rngs = jax.random.split(rng, k)
    state_a = state0
    losses_a = []
    for i in range(k):
        state_a, loss = single(state_a, batches[i], rngs[i])
        losses_a.append(float(loss))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    state_b, losses_b = multi(state0, stacked, rng)

    assert int(state_b.step) == k
    np.testing.assert_allclose(np.asarray(losses_b), np.asarray(losses_a),
                               rtol=1e-6)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-6)
    for ea, eb in zip(jax.tree.leaves(state_a.ema.params),
                      jax.tree.leaves(state_b.ema.params)):
        np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), atol=1e-6)


def test_featurize_on_device_loss_matches_precomputed():
    """The light-batch train step must see the same loss as the full-batch
    step fed the host-precomputed maps."""
    config = _tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch, gt, mask = _light_batch()
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)

    step_light = make_train_step(config, sde, model, donate=False)
    config_full = _tiny_config(featurize_on_device=False)
    step_full = make_train_step(config_full, sde, model, donate=False)

    full_batch = dict(batch)
    full_batch.pop("bb")
    full_batch.pop("mask_res")
    full_batch["coords_6d"] = jnp.asarray(gt)
    full_batch["mask_pair"] = jnp.asarray(mask[:, :, None] & mask[:, None, :])

    rng = jax.random.PRNGKey(7)
    _, loss_light = step_light(state, batch, rng)
    _, loss_full = step_full(state, full_batch, rng)
    np.testing.assert_allclose(float(loss_light), float(loss_full), rtol=1e-4)
