"""Config system: YAML -> attribute-access dict, key-compatible with the reference.

The reference loads YAML into an EasyDict (`/root/reference/train.py:33-34`) and
accesses keys like `config.model.sigma_max`. We keep the exact same YAML schema
(see `/root/reference/configs/test_config.yml`) so a user can bring their config
files over unchanged, and add an optional `mesh` section for TPU parallelism.
"""

from __future__ import annotations

import copy
import yaml


class ConfigDict(dict):
    """A dict with attribute access, recursively applied. Pickle/yaml friendly."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return [cls._wrap(i) for i in v]
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def __deepcopy__(self, memo):
        return ConfigDict(copy.deepcopy(dict(self), memo))

    def to_dict(self):
        out = {}
        for k, v in self.items():
            if isinstance(v, ConfigDict):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [i.to_dict() if isinstance(i, ConfigDict) else i for i in v]
            else:
                out[k] = v
        return out


# Defaults for keys the reference reads but some configs omit. Matches the
# reference's effective behavior (n_heads/context_dim only exist in the
# text-conditioned configs; condition defaults to []).
_DEFAULTS = {
    "training": {
        "sde": "vesde",
        "n_iters": 1_000_000,
        "batch_size": 8,
        "snapshot_freq": 10_000,
        "log_freq": 50,
        "eval_freq": 100,
        "snapshot_freq_for_preemption": 10_000,
        "snapshot_sampling": False,
        "epochs": 1000,
    },
    "sampling": {
        "n_steps_each": 1,
        "noise_removal": True,
        "probability_flow": False,
        "snr": 0.17,
        "method": "pc",
        "predictor": "reverse_diffusion",
        "corrector": "langevin",
    },
    "data": {
        "dataset_path": "",
        "caption_path": "",
        "processed_dataset_path": "",
        "min_res_num": 40,
        "max_res_num": 128,
        "num_channels": 5,
    },
    "model": {
        "condition": [],
        "sigma_max": 100.0,
        "sigma_min": 0.01,
        "num_scales": 2000,
        "beta_min": 0.1,
        "beta_max": 20.0,
        "dropout": 0.1,
        "embedding_type": "positional",
        "name": "ncsnpp",
        "scale_by_sigma": True,
        "ema_rate": 0.999,
        "normalization": "GroupNorm",
        "nonlinearity": "swish",
        "nf": 128,
        "ch_mult": [1, 1, 2, 2, 2, 2],
        "num_res_blocks": 2,
        "attn_resolutions": [16],
        "resamp_with_conv": True,
        "skip_rescale": True,
        "resblock_type": "biggan",
        "attention_type": "ddpm",
        "init_scale": 0.0,
        "fourier_scale": 16,
        "conv_size": 3,
        "n_heads": 8,
        "context_dim": 4096,
        "inpainting": {
            "random_mask_prob": 0.33,
            "contiguous_mask_prob": 0.33,
            "mask_min_len": 0.05,
            "mask_max_len": 0.95,
        },
    },
    "optim": {
        "weight_decay": 0,
        "optimizer": "Adam",
        "lr": 1e-4,
        "beta1": 0.9,
        "eps": 1e-8,
        "warmup": 5000,
        "grad_clip": 1.0,
    },
    # TPU-native extension: device mesh axis sizes. -1 means "all remaining
    # devices". The reference had no distributed story beyond DataParallel
    # (`/root/reference/score_sde_pytorch/utils.py:8`).
    "mesh": {
        "data": -1,
        "model": 1,
    },
    # TPU-native extension: text-encoder selection. The reference hardcodes
    # Vicuna-7B's embedding table on CPU (`/root/reference/train.py:108-112`).
    "text": {
        "encoder": "hash",          # "hash" | "cache" | "hf"
        "model_name": "lmsys/vicuna-7b-v1.3",
        "cache_path": "",
        "max_tokens": 512,
        "pad_to_bucket": 64,         # pad T to multiples of this (avoids recompiles)
    },
    "seed": 42,
    "device": "tpu",
}


def _merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def load_config(path_or_dict) -> ConfigDict:
    """Load a YAML config file (or dict) and apply defaults."""
    if isinstance(path_or_dict, (dict, ConfigDict)):
        user = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            user = yaml.safe_load(f) or {}
    merged = _merge(copy.deepcopy(_DEFAULTS), user)
    cfg = ConfigDict(merged)
    validate_config(cfg)
    return cfg


def validate_config(cfg: ConfigDict) -> None:
    assert cfg.training.sde in ("vesde", "vpsde", "subvpsde"), cfg.training.sde
    assert cfg.data.num_channels in (5, 8), (
        "num_channels must be 5 (no SS) or 8 (with SS block channels); "
        f"got {cfg.data.num_channels}"
    )
    n = cfg.data.max_res_num
    assert n % (2 ** (len(cfg.model.ch_mult) - 1)) == 0, (
        f"max_res_num={n} must be divisible by 2**(len(ch_mult)-1)="
        f"{2 ** (len(cfg.model.ch_mult) - 1)} for the UNet down/up path"
    )
    for c in cfg.model.condition:
        assert c in ("length", "ss", "inpainting"), c
    if "ss" in cfg.model.condition:
        assert cfg.data.num_channels == 8, "ss conditioning needs 8 channels"


def save_config(cfg: ConfigDict, path) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
