"""Shared tiny-config helpers for tests."""

import numpy as np

from text2protein_tpu.config import load_config


def tiny_config(**overrides):
    base = {
        "training": {"sde": "vesde", "batch_size": 2},
        "data": {"min_res_num": 4, "max_res_num": 16, "num_channels": 5},
        "model": {
            "condition": [],
            "nf": 8,
            "ch_mult": [1, 2],
            "num_res_blocks": 1,
            "attn_resolutions": [8],
            "n_heads": 2,
            "context_dim": 16,
            "num_scales": 8,
            "dropout": 0.0,
        },
        "text": {"encoder": "hash", "max_tokens": 8, "pad_to_bucket": 8},
        "optim": {"warmup": 2},
        "sampling": {},
        "seed": 0,
    }

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(base, overrides)
    return load_config(base)


def tiny_batch(config, b=2, with_context=True, seed=0):
    """Synthetic NHWC device batch matching the loss contract."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    n = config.data.max_res_num
    c = config.data.num_channels
    lengths = rng.randint(config.data.min_res_num, n + 1, size=b).astype(np.int32)
    coords = rng.uniform(-1, 1, size=(b, n, n, c)).astype(np.float32)
    # symmetric-ish maps with a valid padding channel
    mask_pair = np.zeros((b, n, n), dtype=bool)
    for i, l in enumerate(lengths):
        mask_pair[i, :l, :l] = True
    coords = coords * mask_pair[..., None]
    coords[..., -1] = mask_pair
    ss_spans = np.full((b, 4, 2), -1, dtype=np.int32)
    ss_spans[:, 0] = (1, 5)
    batch = {
        "coords_6d": jnp.asarray(coords),
        "mask_pair": jnp.asarray(mask_pair),
        "ss_spans": jnp.asarray(ss_spans),
        "length": jnp.asarray(lengths),
    }
    if with_context:
        t, d = 8, config.model.context_dim
        batch["context"] = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
        cm = np.zeros((b, t), dtype=bool)
        cm[:, :5] = True
        batch["context_mask"] = jnp.asarray(cm)
    return batch
