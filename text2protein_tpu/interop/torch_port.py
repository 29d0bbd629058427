"""Port PyTorch-reference UNet weights into the Flax ScoreUNet.

The reference model (`/root/reference/score_sde_pytorch/models/ncsnpp.py:
71-263`) and our `models/unet.py` share the same topology by design; this
module materializes the correspondence as an explicit (flax_path, torch_key,
transform) mapping derived by replaying the architecture's construction loops
from the config. Uses:

  * migrate a reference-trained `.pth` checkpoint onto TPU
    (`flax_params_from_torch_state(state_dict, ...)`), and
  * the fp32 parity harness (`tests/test_parity_torch.py`), which proves the
    two implementations agree forward-for-forward.

Weight-layout conventions bridged here:
  torch Linear  (out, in)        -> flax Dense kernel (in, out)      [T]
  torch Conv2d  (out, in, kh,kw) -> flax Conv kernel (kh, kw, in, out)
  torch 1x1 Conv2d as flax Dense -> kernel (in, out) = W[:, :, 0, 0].T
  reference NIN W (in, out)      -> flax Dense kernel (in, out)      [copy]
  torch GroupNorm/LayerNorm weight -> flax `scale`

Only numpy and the state-dict mapping live here — no torch import is needed
to *consume* a mapping (state dicts are passed in as array mappings).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "build_param_mapping",
    "flax_params_from_torch_state",
    "torch_state_from_flax_params",
]


def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _t_conv(w):
    return np.ascontiguousarray(
        np.asarray(w, np.float32).transpose(2, 3, 1, 0)
    )


def _t_conv1x1_dense(w):
    return np.ascontiguousarray(np.asarray(w, np.float32)[:, :, 0, 0].T)


def _t_copy(w):
    return np.asarray(w, np.float32)


def _inv_linear(w):
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _inv_conv(w):
    return np.ascontiguousarray(
        np.asarray(w, np.float32).transpose(3, 2, 0, 1)
    )


def _inv_conv1x1_dense(w):
    return np.ascontiguousarray(
        np.asarray(w, np.float32).T[:, :, None, None]
    )


# forward transform -> inverse (torch <- flax); copies invert to themselves
_INVERSE = {
    _t_linear: _inv_linear,
    _t_conv: _inv_conv,
    _t_conv1x1_dense: _inv_conv1x1_dense,
    _t_copy: _t_copy,
}


# kind -> [(flax_leaf, torch_suffix, transform)]
_KINDS = {
    "linear": [("kernel", "weight", _t_linear), ("bias", "bias", _t_copy)],
    "linear_nobias": [("kernel", "weight", _t_linear)],
    "conv": [("kernel", "weight", _t_conv), ("bias", "bias", _t_copy)],
    "conv1x1_dense": [
        ("kernel", "weight", _t_conv1x1_dense),
        ("bias", "bias", _t_copy),
    ],
    "nin": [("kernel", "W", _t_copy), ("bias", "b", _t_copy)],
    "norm": [("scale", "weight", _t_copy), ("bias", "bias", _t_copy)],
}


def build_param_mapping(
    num_channels: int,
    max_res_num: int,
    nf: int,
    ch_mult,
    num_res_blocks: int,
    attn_resolutions,
):
    """Replay the UNet construction and emit the full parameter mapping.

    Returns a list of (flax_path: tuple[str, ...], torch_key_prefix: str,
    kind: str) triples, one per torch submodule carrying parameters. The
    construction loops mirror `ncsnpp.py:99-217` / `models/unet.py` exactly
    (BigGAN resblocks; attention pairs at `attn_resolutions`).
    """
    ch_mult = tuple(ch_mult)
    attn_resolutions = tuple(attn_resolutions)
    num_resolutions = len(ch_mult)
    all_res = [max_res_num // (2**i) for i in range(num_resolutions)]

    entries = []
    counters = {"res": 0, "attn": 0, "spat": 0}

    # --- time embedding + stem + output head (top-level flax modules)
    entries.append((("Dense_0",), "pre_blocks.0", "linear"))
    entries.append((("Dense_1",), "pre_blocks.1", "linear"))
    entries.append((("Conv_0",), "pre_conv", "conv"))
    entries.append((("GroupNormF32Stats_0",), "out.0", "norm"))
    entries.append((("Conv_1",), "out.2", "conv"))

    def emit_resblock(tbase, has_conv2):
        i = counters["res"]
        counters["res"] += 1
        f = f"ResnetBlockBigGAN_{i}"
        entries.append(((f, "GroupNormF32Stats_0"), f"{tbase}.GroupNorm_0", "norm"))
        entries.append(((f, "Conv_0"), f"{tbase}.Conv_0", "conv"))
        entries.append(((f, "Dense_0"), f"{tbase}.Dense_0", "linear"))
        entries.append(((f, "GroupNormF32Stats_1"), f"{tbase}.GroupNorm_1", "norm"))
        entries.append(((f, "Conv_1"), f"{tbase}.Conv_1", "conv"))
        if has_conv2:
            entries.append(((f, "Conv_2"), f"{tbase}.Conv_2", "conv"))

    def emit_attnblock(tbase):
        i = counters["attn"]
        counters["attn"] += 1
        f = f"AttnBlock_{i}"
        entries.append(((f, "GroupNormF32Stats_0"), f"{tbase}.GroupNorm_0", "norm"))
        for k in range(4):
            entries.append(((f, f"Dense_{k}"), f"{tbase}.NIN_{k}", "nin"))

    def emit_spatial(tbase):
        i = counters["spat"]
        counters["spat"] += 1
        f = f"SpatialTransformer_{i}"
        entries.append(((f, "norm"), f"{tbase}.norm", "norm"))
        entries.append(((f, "proj_in"), f"{tbase}.proj_in", "conv1x1_dense"))
        b = (f, "block_0")
        tb = f"{tbase}.transformer_blocks.0"
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                entries.append(
                    (b + (attn, proj), f"{tb}.{attn}.{proj}", "linear_nobias")
                )
            entries.append((b + (attn, "to_out"), f"{tb}.{attn}.to_out.0", "linear"))
        for norm in ("norm1", "norm2", "norm3"):
            entries.append((b + (norm,), f"{tb}.{norm}", "norm"))
        entries.append((b + ("ff", "GEGLU_0", "Dense_0"), f"{tb}.ff.net.0.proj", "linear"))
        entries.append((b + ("ff", "Dense_0"), f"{tb}.ff.net.2", "linear"))
        entries.append(((f, "proj_out"), f"{tbase}.proj_out", "conv1x1_dense"))

    # --- down path (torch `input_blocks`, ncsnpp.py:142-173)
    ib = 0
    in_ch = nf
    for i_level in range(num_resolutions):
        for _ in range(num_res_blocks):
            out_ch = nf * ch_mult[i_level]
            j = 0
            emit_resblock(f"input_blocks.{ib}.{j}", has_conv2=in_ch != out_ch)
            in_ch = out_ch
            if all_res[i_level] in attn_resolutions:
                emit_attnblock(f"input_blocks.{ib}.{j + 1}")
                emit_spatial(f"input_blocks.{ib}.{j + 2}")
            ib += 1
        if i_level != num_resolutions - 1:
            emit_resblock(f"input_blocks.{ib}.0", has_conv2=True)  # down=True
            ib += 1

    # --- mid (ncsnpp.py:177-185)
    emit_resblock("mid_blocks.0", has_conv2=False)
    emit_attnblock("mid_blocks.1")
    emit_spatial("mid_blocks.2")
    emit_resblock("mid_blocks.3", has_conv2=False)

    # --- up path (torch `out_blocks`, ncsnpp.py:188-208); skip-concat widths
    # always differ from out_ch so every resblock has Conv_2
    skip_channels = [nf]
    ch = nf
    for i_level in range(num_resolutions):
        for _ in range(num_res_blocks):
            ch = nf * ch_mult[i_level]
            skip_channels.append(ch)
        if i_level != num_resolutions - 1:
            skip_channels.append(ch)

    ob = 0
    for i_level in reversed(range(num_resolutions)):
        for i_block in range(num_res_blocks + 1):
            j = 0
            skip_channels.pop()
            emit_resblock(f"out_blocks.{ob}.{j}", has_conv2=True)
            if all_res[i_level] in attn_resolutions:
                emit_attnblock(f"out_blocks.{ob}.{j + 1}")
                emit_spatial(f"out_blocks.{ob}.{j + 2}")
                j += 2
            if i_level != 0 and i_block == num_res_blocks:
                emit_resblock(f"out_blocks.{ob}.{j + 1}", has_conv2=True)  # up
            ob += 1
    assert not skip_channels, skip_channels

    return entries


def flax_params_from_torch_state(
    state_dict,
    num_channels: int,
    max_res_num: int,
    nf: int,
    ch_mult,
    num_res_blocks: int,
    attn_resolutions,
    template=None,
):
    """Build a Flax `params` pytree (nested dicts of np.float32 arrays) from a
    reference UNetModel state dict (tensors or arrays).

    With `template` (a flax params tree from `model.init`), every template
    leaf must be covered by the mapping and shapes must match — the parity
    guarantee. Without it, the nested dict is built from the mapping alone.
    """
    mapping = build_param_mapping(
        num_channels, max_res_num, nf, ch_mult, num_res_blocks,
        attn_resolutions,
    )
    params: dict = {}
    used_keys = set()
    for flax_path, tkey, kind in mapping:
        for leaf, suffix, transform in _KINDS[kind]:
            full_tkey = f"{tkey}.{suffix}"
            if full_tkey not in state_dict:
                raise KeyError(f"torch state dict missing {full_tkey}")
            w = state_dict[full_tkey]
            if hasattr(w, "detach"):  # torch tensor
                w = w.detach().cpu().numpy()
            node = params
            for part in flax_path:
                node = node.setdefault(part, {})
            node[leaf] = transform(w)
            used_keys.add(full_tkey)

    if template is not None:
        import jax.tree_util as jtu

        t_leaves = {
            jtu.keystr(p): l.shape
            for p, l in jtu.tree_leaves_with_path(template)
        }
        p_leaves = {
            jtu.keystr(p): l.shape
            for p, l in jtu.tree_leaves_with_path(params)
        }
        missing = sorted(set(t_leaves) - set(p_leaves))
        extra = sorted(set(p_leaves) - set(t_leaves))
        if missing or extra:
            raise ValueError(
                f"param tree mismatch; missing from port: {missing[:8]}, "
                f"unknown in template: {extra[:8]}"
            )
        bad = [
            k for k in t_leaves if t_leaves[k] != p_leaves[k]
        ]
        if bad:
            raise ValueError(
                "shape mismatches: "
                + ", ".join(f"{k}: {p_leaves[k]} != {t_leaves[k]}" for k in bad[:8])
            )

    # Non-parameter buffers the reference registers (the sigma ladder is
    # config-derived, rebuilt on the flax side) are expected to be unused.
    unused = sorted(
        k for k in set(state_dict) - used_keys if not k.endswith("sigmas")
    )
    if unused:
        # architecture drift in the torch checkpoint (extra/renamed modules)
        # must not be silently ignored — the port would be numerically wrong
        raise ValueError(f"torch state dict keys not consumed by the "
                         f"mapping: {unused[:8]}{'...' if len(unused) > 8 else ''}")
    return params

def torch_state_from_flax_params(
    params,
    num_channels: int,
    max_res_num: int,
    nf: int,
    ch_mult,
    num_res_blocks: int,
    attn_resolutions,
    sigmas=None,
):
    """Export a Flax `params` pytree to a reference-format torch state dict
    (plain `{key: np.float32 array}` — `torch.save`-able as-is after an
    optional `torch.from_numpy` map). Exact inverse of
    `flax_params_from_torch_state`: porting the result back reproduces the
    input tree bit-for-bit (tested), so TPU-trained checkpoints can be
    consumed by the reference's `restore_checkpoint`
    (`/root/reference/score_sde_pytorch/utils.py:11-26`, model load is
    strict=False so the absent `sigmas` buffer is tolerated; pass `sigmas`
    to emit it explicitly).

    Every flax leaf must be consumed by the mapping — an unexported leaf
    means architecture drift and would silently produce a numerically wrong
    checkpoint.
    """
    mapping = build_param_mapping(
        num_channels, max_res_num, nf, ch_mult, num_res_blocks,
        attn_resolutions,
    )
    state = {}
    consumed = set()
    for flax_path, tkey, kind in mapping:
        node = params
        for part in flax_path:
            if part not in node:
                raise KeyError(
                    f"flax params missing {'/'.join(flax_path)} "
                    f"(wanted for torch key {tkey})"
                )
            node = node[part]
        for leaf, suffix, transform in _KINDS[kind]:
            if leaf not in node:
                raise KeyError(f"{'/'.join(flax_path)} has no leaf {leaf}")
            state[f"{tkey}.{suffix}"] = _INVERSE[transform](node[leaf])
            consumed.add(flax_path + (leaf,))

    import jax.tree_util as jtu

    all_leaves = {
        tuple(
            k.key for k in p
        ): None
        for p, _ in jtu.tree_leaves_with_path(params)
    }
    unexported = sorted(
        "/".join(p) for p in set(all_leaves) - consumed
    )
    if unexported:
        raise ValueError(
            f"flax leaves not covered by the export mapping: "
            f"{unexported[:8]}{'...' if len(unexported) > 8 else ''}"
        )
    if sigmas is not None:
        state["sigmas"] = np.asarray(sigmas, np.float32)
    return state
