"""Conditioning & masking utilities (JAX, keyed RNG).

Re-design of `/root/reference/utils.py:15-148`: host-RNG loops become vmapped
`jax.random` mask constructions with identical semantics:
  * random / contiguous / no inpainting-mask choice by config probabilities,
    span length U(mask_min*L, mask_max*L), 1-D mask -> pair mask via
    logical_or(m_i, m_j);
  * "1:5,10:15" user mask specs;
  * per-batch condition extraction (length / ss / inpainting);
  * length-sweep mask stacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pair_mask(m):
    """(…, N) 1-D mask -> (…, N, N) via logical_or(m_i, m_j)."""
    return jnp.logical_or(m[..., :, None], m[..., None, :])


def random_mask_batch(key, lengths, n, config):
    """Training-time inpainting masks (`/root/reference/utils.py:15-60`).

    Args:
      key: PRNG key; lengths: (B,) int32 real lengths; n: padded size.
    Returns:
      (B, N, N) bool mask_inpaint (True = masked/inpainted region), or None
      when "inpainting" is not in the condition list.
    """
    if "inpainting" not in config.model.condition:
        return None
    b = lengths.shape[0]
    mask_min = config.model.inpainting.mask_min_len
    mask_max = config.model.inpainting.mask_max_len
    p_rand = config.model.inpainting.random_mask_prob
    p_cont = config.model.inpainting.contiguous_mask_prob

    key, k_choice, k_len, k_perm, k_start = jax.random.split(key, 5)
    prob = jax.random.uniform(k_choice)  # one draw per batch, like the ref

    lo = (mask_min * lengths).astype(jnp.int32)
    hi = (mask_max * lengths).astype(jnp.int32)
    span = lo + (
        jax.random.uniform(k_len, (b,)) * jnp.maximum(hi - lo, 1)
    ).astype(jnp.int32)

    pos = jnp.arange(n)

    # Random masking: `span` random indices among [0, L).
    def rand_mask(k, l, s):
        scores = jax.random.uniform(k, (n,))
        scores = jnp.where(pos < l, scores, jnp.inf)  # only real residues
        thresh = jnp.sort(scores)[jnp.maximum(s - 1, 0)]
        return (scores <= thresh) & (pos < l) & (s > 0)

    rand_masks = jax.vmap(rand_mask)(jax.random.split(k_perm, b), lengths, span)

    # Contiguous masking: start ~ U(0, L - span).
    start = (
        jax.random.uniform(k_start, (b,))
        * jnp.maximum(lengths - span, 1).astype(jnp.float32)
    ).astype(jnp.int32)
    cont_masks = (pos[None, :] >= start[:, None]) & (
        pos[None, :] < (start + span)[:, None]
    )

    ones = jnp.ones((b, n), dtype=bool)
    mask1d = jnp.where(
        prob < p_rand, rand_masks, jnp.where(prob > 1 - p_cont, cont_masks, ones)
    )
    return _pair_mask(mask1d)


def selected_mask_batch(mask_info: str, batch_size: int, n: int):
    """User mask spec "1:5,10:15" (inclusive ends) -> (B, N, N) bool
    (`/root/reference/utils.py:62-81`)."""
    m = np.zeros(n, dtype=bool)
    for r in mask_info.split(","):
        if ":" in r:
            s, e = r.split(":")
            m[int(s) : int(e) + 1] = True
        else:
            m[int(r)] = True
    m = jnp.asarray(np.tile(m, (batch_size, 1)))
    return _pair_mask(m)


def length_mask(lengths, n):
    """(B,) lengths -> (B, N, N) bool, True on the leading [l, l] square."""
    pos = jnp.arange(n)
    row = pos[None, :] < lengths[:, None]  # (B, N)
    return row[:, :, None] & row[:, None, :]


def get_condition_from_batch(config, batch, mask_info=None, rng=None):
    """Extract the sampler's condition dict from a batch
    (`/root/reference/utils.py:83-106`). Accepts host batches in the
    reference's channel-first (B, C, N, N) record layout or device NHWC;
    returned arrays are NHWC."""
    out = {}
    n = config.data.max_res_num
    nc = config.data.num_channels
    coords = jnp.asarray(batch["coords_6d"])
    if coords.ndim == 4 and coords.shape[-1] != nc and coords.shape[1] == nc:
        coords = coords.transpose(0, 2, 3, 1)  # channel-first -> NHWC
    for c in config.model.condition:
        if c == "length":
            out[c] = length_mask(jnp.asarray(batch["length"]), n)
        elif c == "ss":
            out[c] = coords[..., 4:7]
        elif c == "inpainting":
            if mask_info is not None:
                mask = selected_mask_batch(mask_info, coords.shape[0], n)
            else:
                assert rng is not None, "random inpainting masks need an rng"
                mask = random_mask_batch(
                    rng, jnp.asarray(batch["length"]), n, config
                )
            out[c] = {"coords_6d": coords, "mask_inpaint": mask}
    return out


def get_conditions_from_pdb(pdb, config, chain="A", mask_info=None, batch_size=8):
    """Build a sampler condition from a real PDB chain
    (`/root/reference/utils.py:122-137`): isolate the chain, featurize it, and
    replicate across the batch."""
    from .data.dataset import featurize_pdb_file, make_batch
    from .data.pdbio import read_pdb, write_backbone_pdb
    import tempfile
    from pathlib import Path

    st = read_pdb(pdb).filter_chain(chain)
    with tempfile.TemporaryDirectory() as tmp:
        # Re-serialize the isolated chain, then run the standard featurizer.
        coords, seq = [], []
        for r in st.amino_residues():
            n_, ca_, c_ = r.atom("N"), r.atom("CA"), r.atom("C")
            if n_ is None or ca_ is None or c_ is None:
                continue
            coords.append([n_, ca_, c_])
            from .data.vocab import THREE_TO_ONE, NON_STANDARD_TO_STANDARD

            name = r.name if r.name in THREE_TO_ONE else NON_STANDARD_TO_STANDARD.get(r.name, "UNK")
            seq.append(THREE_TO_ONE[name])
        path = Path(tmp) / f"{Path(pdb).stem}_chain_{chain}.pdb"
        write_backbone_pdb(path, np.asarray(coords), seq="".join(seq), chain=chain)
        rec = featurize_pdb_file(
            path,
            config.data.min_res_num,
            config.data.max_res_num,
            ss_constraints=config.data.num_channels == 8,
        )
    assert rec is not None, f"{pdb} chain {chain} rejected by the featurizer"
    batch = make_batch([rec] * batch_size, config.data.max_res_num)
    return get_condition_from_batch(config, batch, mask_info=mask_info)


def get_mask_all_lengths(config, batch_size=16):
    """(L_all, B, N, N) length masks for each length in [min, max]
    (`/root/reference/utils.py:139-148`)."""
    n = config.data.max_res_num
    all_lengths = np.arange(config.data.min_res_num, n + 1)
    masks = np.zeros((len(all_lengths), batch_size, n, n), dtype=bool)
    for idx, l in enumerate(all_lengths):
        masks[idx, :, :l, :l] = True
    return jnp.asarray(masks)


def batch_to_device_arrays(batch, config, rng=None, device=True):
    """Host batch (from data.make_batch) -> the array dict the loss consumes,
    including NHWC transposition and inpainting masks. `device=False` keeps
    the arrays on the host (numpy) so callers can stack several batches and
    transfer once (cli/train.py fused multi-step launches).

    With `data.featurize_on_device`, the (C, N, N) maps are NOT shipped;
    instead the backbone coords + residue mask (and, for C=8, the SS block
    channels as uint8) cross the link and the train/eval step rebuilds
    coords_6d/mask_pair on device (data.featurize.featurize_batch_jax) —
    ~100x less host->device traffic per step."""
    as_array = jnp.asarray if device else np.asarray
    if config.data.get("featurize_on_device", False):
        mask_res = np.einsum("bii->bi", np.asarray(batch["mask_pair"]))
        out = {
            "bb": as_array(batch["coords"]),
            "mask_res": as_array(mask_res.astype(bool)),
            "ss_spans": as_array(batch["ss_spans"]),
            "length": as_array(batch["length"]),
        }
        if int(config.data.num_channels) == 8:
            ss = np.asarray(batch["coords_6d"][:, 4:7]).transpose(0, 2, 3, 1)
            out["ss_block"] = as_array(ss.astype(np.uint8))
        if "inpainting" in config.model.condition:
            assert rng is not None
            out["mask_inpaint"] = as_array(random_mask_batch(
                rng, np.asarray(batch["length"]), config.data.max_res_num,
                config,
            ))
        return out
    coords = np.asarray(batch["coords_6d"]).transpose(0, 2, 3, 1)  # -> NHWC
    out = {
        "coords_6d": as_array(coords),
        "mask_pair": as_array(batch["mask_pair"]),
        "ss_spans": as_array(batch["ss_spans"]),
        "length": as_array(batch["length"]),
    }
    if "inpainting" in config.model.condition:
        assert rng is not None
        out["mask_inpaint"] = as_array(random_mask_batch(
            rng, np.asarray(batch["length"]), config.data.max_res_num, config
        ))
    return out
