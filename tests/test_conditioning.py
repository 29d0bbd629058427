"""Conditioning/masking utilities (`/root/reference/utils.py:15-148` parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from text2protein_tpu.conditioning import (
    random_mask_batch,
    selected_mask_batch,
    length_mask,
    get_condition_from_batch,
    get_mask_all_lengths,
    batch_to_device_arrays,
)
from helpers import tiny_config


def test_selected_mask_batch():
    m = np.asarray(selected_mask_batch("1:3,6", batch_size=2, n=8))
    assert m.shape == (2, 8, 8)
    # residues 1..3 (inclusive) and 6 are masked; pair mask = OR
    masked_1d = {1, 2, 3, 6}
    for i in range(8):
        for j in range(8):
            want = (i in masked_1d) or (j in masked_1d)
            assert m[0, i, j] == want, (i, j)


def test_length_mask():
    m = np.asarray(length_mask(jnp.array([3, 5]), 6))
    assert m[0, :3, :3].all() and not m[0, 3:, :].any() and not m[0, :, 3:].any()
    assert m[1, :5, :5].all() and not m[1, 5:, :].any()


def test_random_mask_batch_modes():
    config = tiny_config(
        model={
            "condition": ["inpainting"],
            "inpainting": {
                "random_mask_prob": 0.33,
                "contiguous_mask_prob": 0.33,
                "mask_min_len": 0.2,
                "mask_max_len": 0.8,
            },
        }
    )
    lengths = jnp.array([10, 16], jnp.int32)
    n = 16
    saw = {"some": False, "none": False}
    for seed in range(30):
        m = random_mask_batch(jax.random.PRNGKey(seed), lengths, n, config)
        m = np.asarray(m)
        assert m.shape == (2, 16, 16)
        # pair mask structure: m[i,j] = row_i | row_j for some 1-D mask
        diag = np.diagonal(m, axis1=1, axis2=2)
        want = diag[:, :, None] | diag[:, None, :]
        np.testing.assert_array_equal(m, want)
        frac = diag[0, :10].mean()
        if 0 < frac < 1:
            saw["some"] = True
        if frac == 1.0:  # "no mask" mode = all ones
            saw["none"] = True
        # 1-D mask never exceeds the real length in masked modes
        if frac < 1.0:
            assert not diag[0, 10:].any()
    assert saw["some"] and saw["none"], saw


def test_random_mask_batch_span_bounds():
    config = tiny_config(
        model={
            "condition": ["inpainting"],
            "inpainting": {
                "random_mask_prob": 1.0,  # always random mode
                "contiguous_mask_prob": 0.0,
                "mask_min_len": 0.25,
                "mask_max_len": 0.5,
            },
        }
    )
    lengths = jnp.array([16, 12], jnp.int32)
    for seed in range(10):
        m = np.asarray(
            random_mask_batch(jax.random.PRNGKey(seed), lengths, 16, config)
        )
        diag = np.diagonal(m, axis1=1, axis2=2)
        n_masked = diag[0].sum()
        assert 0.25 * 16 - 1 <= n_masked <= 0.5 * 16 + 1, n_masked


def test_none_when_not_configured():
    config = tiny_config()
    assert random_mask_batch(jax.random.PRNGKey(0), jnp.array([8]), 16, config) is None


def test_get_mask_all_lengths():
    config = tiny_config()
    masks = np.asarray(get_mask_all_lengths(config, batch_size=3))
    n_lengths = config.data.max_res_num - config.data.min_res_num + 1
    assert masks.shape == (n_lengths, 3, 16, 16)
    assert masks[0, 0, :4, :4].all() and not masks[0, 0, 4:, :].any()
    assert masks[-1].all()


def test_get_condition_from_batch_layouts():
    """Channel-first host batches and NHWC device batches give the same ss
    condition."""
    config = tiny_config(
        data={"num_channels": 8}, model={"condition": ["length", "ss"]}
    )
    rng = np.random.RandomState(0)
    n = 16
    cnn = rng.randn(2, 8, n, n).astype(np.float32)
    batch_cf = {"coords_6d": cnn, "length": np.array([8, 12], np.int32)}
    batch_nhwc = {
        "coords_6d": cnn.transpose(0, 2, 3, 1),
        "length": np.array([8, 12], np.int32),
    }
    c1 = get_condition_from_batch(config, batch_cf)
    c2 = get_condition_from_batch(config, batch_nhwc)
    np.testing.assert_allclose(np.asarray(c1["ss"]), np.asarray(c2["ss"]))
    np.testing.assert_array_equal(np.asarray(c1["length"]), np.asarray(c2["length"]))
    assert c1["ss"].shape == (2, n, n, 3)


def test_batch_to_device_arrays_transposes():
    config = tiny_config()
    rng = np.random.RandomState(0)
    n = 16
    host = {
        "coords_6d": rng.randn(2, 5, n, n).astype(np.float32),
        "mask_pair": np.ones((2, n, n), bool),
        "ss_spans": np.full((2, 4, 2), -1, np.int32),
        "length": np.array([8, 10], np.int32),
    }
    arrays = batch_to_device_arrays(host, config)
    assert arrays["coords_6d"].shape == (2, n, n, 5)
    np.testing.assert_allclose(
        np.asarray(arrays["coords_6d"][0, :, :, 3]), host["coords_6d"][0, 3]
    )
