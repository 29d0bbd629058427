"""Caption -> (B, T, D) context embeddings.

The reference tokenizes PDB paper abstracts with the Vicuna-7B tokenizer and
looks up ONLY the LLM's token-embedding table — the transformer stack never
runs (`/root/reference/score_sde_pytorch/losses.py:94-103`,
`/root/reference/train.py:108-112`). That lookup runs on CPU every training
step. Here the offline-cache path (`/root/reference/text_preprocess.py:9-24`)
is promoted to the default, with three interchangeable encoders:

  * `CachedTextEncoder` — precomputed id->embedding cache (npz), zero
    per-step cost; the production path.
  * `HFEmbeddingEncoder` — transformers tokenizer + embedding table
    (reference-faithful on-the-fly path; requires local model weights).
  * `HashTextEncoder`   — deterministic hashed-token embedding table; needs
    no external weights. Default when no LLM weights are present (training
    and tests remain fully runnable).

All encoders return float arrays padded to a fixed token bucket (multiples of
`pad_to_bucket`) plus a boolean token mask, so jit never recompiles across
caption lengths.
"""

from __future__ import annotations

import hashlib
import re
from pathlib import Path

import numpy as np


def _bucket(t: int, bucket: int, t_max: int) -> int:
    t = max(1, min(t, t_max))
    return min(((t + bucket - 1) // bucket) * bucket, t_max)


class TextEncoder:
    """Interface: encode(captions: list[str]) -> (emb (B, T, D) f32, mask (B, T) bool)."""

    dim: int

    def encode(self, captions):
        raise NotImplementedError

    def __call__(self, captions):
        return self.encode(captions)


class HashTextEncoder(TextEncoder):
    """Deterministic hashed-wordpiece embedding table.

    Tokenizes on word boundaries, hashes each token into a bucketed vocabulary,
    and maps ids to fixed Gaussian embeddings generated from a seeded counter
    RNG — deterministic across processes, no weight files. Not a language
    model: a stand-in context source with the same interface/shape contract as
    the Vicuna embedding path.
    """

    def __init__(self, dim=4096, vocab_size=65536, max_tokens=512,
                 pad_to_bucket=64, seed=0):
        self.dim = dim
        self.vocab_size = vocab_size
        self.max_tokens = max_tokens
        self.pad_to_bucket = pad_to_bucket
        self.seed = seed

    def _token_ids(self, text: str) -> np.ndarray:
        toks = re.findall(r"\w+|[^\w\s]", text.lower())[: self.max_tokens]
        if not toks:
            toks = [""]
        ids = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
                )
                % self.vocab_size
                for t in toks
            ],
            dtype=np.int64,
        )
        return ids

    def _embed_ids(self, ids: np.ndarray) -> np.ndarray:
        out = np.empty((len(ids), self.dim), dtype=np.float32)
        for i, tid in enumerate(ids):
            rng = np.random.default_rng(self.seed * 1_000_003 + int(tid))
            out[i] = rng.standard_normal(self.dim, dtype=np.float32) * (
                self.dim**-0.5
            )
        return out

    def encode(self, captions):
        ids = [self._token_ids(c) for c in captions]
        t = _bucket(max(len(i) for i in ids), self.pad_to_bucket, self.max_tokens)
        b = len(captions)
        emb = np.zeros((b, t, self.dim), dtype=np.float32)
        mask = np.zeros((b, t), dtype=bool)
        for bi, tid in enumerate(ids):
            k = min(len(tid), t)
            emb[bi, :k] = self._embed_ids(tid[:k])
            mask[bi, :k] = True
        return emb, mask


class CachedTextEncoder(TextEncoder):
    """Lookup of precomputed caption embeddings by pdb id (see
    `encode_captions` below / `/root/reference/text_preprocess.py:9-24`)."""

    def __init__(self, cache_path, pad_to_bucket=64, max_tokens=512):
        self.cache_path = Path(cache_path)
        self.pad_to_bucket = pad_to_bucket
        self.max_tokens = max_tokens
        z = np.load(self.cache_path, allow_pickle=False)
        self._emb = {}
        self._len = {}
        for k in z.files:
            if k.endswith("__len"):
                continue
            self._emb[k] = z[k]
            self._len[k] = int(z[f"{k}__len"]) if f"{k}__len" in z.files else z[k].shape[0]
        any_emb = next(iter(self._emb.values()))
        self.dim = any_emb.shape[-1]

    def encode_ids(self, pdb_ids):
        lens = [self._len[i] for i in pdb_ids]
        t = _bucket(max(lens), self.pad_to_bucket, self.max_tokens)
        b = len(pdb_ids)
        emb = np.zeros((b, t, self.dim), dtype=np.float32)
        mask = np.zeros((b, t), dtype=bool)
        for bi, pid in enumerate(pdb_ids):
            e = self._emb[pid][: t]
            emb[bi, : e.shape[0]] = e
            mask[bi, : min(lens[bi], t)] = True
        return emb, mask

    def encode(self, captions):
        raise TypeError(
            "CachedTextEncoder encodes by pdb id (encode_ids), not raw text"
        )


def _load_embed_table(model_name):
    """Load ONLY the token-embedding weight from a HF checkpoint.

    The reference materializes the full Vicuna-7B in fp32 (~28 GB host RAM)
    just to keep `model.embed_tokens` (`/root/reference/train.py:108-112`);
    here the table is read directly out of the (sharded) safetensors /
    pytorch_model files, so memory is bounded by the embedding table itself.
    Returns a torch float32 tensor (vocab, dim).
    """
    import json

    import torch
    from transformers.utils import cached_file

    keys = (
        "model.embed_tokens.weight",  # llama-family
        "transformer.wte.weight",     # gpt2-family
        "embed_tokens.weight",
    )

    def get(filename, required=False):
        try:
            return cached_file(model_name, filename)
        except Exception:
            if required:
                raise
            return None

    def pick_key(available):
        for k in keys:
            if k in available:
                return k
        for k in available:
            if k.endswith("embed_tokens.weight") or k.endswith("wte.weight"):
                return k
        raise KeyError(f"no embedding key among {sorted(available)[:8]}…")

    # sharded / single safetensors
    idx = get("model.safetensors.index.json")
    st = get("model.safetensors") if idx is None else None
    if idx is not None or st is not None:
        from safetensors import safe_open

        if idx is not None:
            weight_map = json.load(open(idx))["weight_map"]
            key = pick_key(weight_map)
            st = get(weight_map[key], required=True)
            with safe_open(st, framework="pt") as f:
                return f.get_tensor(key).float()
        with safe_open(st, framework="pt") as f:
            key = pick_key(set(f.keys()))
            return f.get_tensor(key).float()

    # torch .bin fallback (loads one shard, not the whole model)
    idx = get("pytorch_model.bin.index.json")
    if idx is not None:
        weight_map = json.load(open(idx))["weight_map"]
        key = pick_key(weight_map)
        shard = torch.load(get(weight_map[key], required=True),
                           map_location="cpu", weights_only=True)
        return shard[key].float()
    shard = torch.load(get("pytorch_model.bin", required=True),
                       map_location="cpu", weights_only=True)
    return shard[pick_key(shard)].float()


class HFEmbeddingEncoder(TextEncoder):
    """Reference-faithful path: HF tokenizer + LLM token-embedding table
    (`add_special_tokens=False, max_length=512, truncation=True`,
    `/root/reference/score_sde_pytorch/losses.py:96-103`). Requires the model
    weights to be available locally; only the embedding table is read
    (safetensors partial load), never the full model."""

    def __init__(self, model_name="lmsys/vicuna-7b-v1.3", max_tokens=512,
                 pad_to_bucket=64):
        import torch  # CPU-only is fine; runs offline
        from transformers import AutoTokenizer

        self.max_tokens = max_tokens
        self.pad_to_bucket = pad_to_bucket
        try:  # the reference uses the slow LlamaTokenizer (train.py:108-112)
            self.tokenizer = AutoTokenizer.from_pretrained(
                model_name, use_fast=False
            )
        except Exception:  # fast-only checkpoints
            self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        if self.tokenizer.pad_token is None:
            self.tokenizer.pad_token = (
                self.tokenizer.eos_token or self.tokenizer.unk_token
            )
        weight = _load_embed_table(model_name)
        self.embed = torch.nn.Embedding.from_pretrained(weight, freeze=True)
        self.dim = self.embed.embedding_dim

    def encode(self, captions):
        import torch

        toks = self.tokenizer(
            list(captions),
            return_tensors="pt",
            add_special_tokens=False,
            max_length=self.max_tokens,
            padding=True,
            truncation=True,
        )
        with torch.no_grad():
            emb = self.embed(toks.input_ids).float().numpy()
        mask = toks.attention_mask.bool().numpy()
        b, t = mask.shape
        tb = _bucket(t, self.pad_to_bucket, self.max_tokens)
        if tb > t:
            emb = np.pad(emb, ((0, 0), (0, tb - t), (0, 0)))
            mask = np.pad(mask, ((0, 0), (0, tb - t)))
        return emb.astype(np.float32), mask


def build_text_encoder(config) -> TextEncoder:
    tc = config.text
    kind = tc.encoder.lower()
    if kind == "cache":
        return CachedTextEncoder(
            tc.cache_path, pad_to_bucket=tc.pad_to_bucket, max_tokens=tc.max_tokens
        )
    if kind == "hf":
        try:
            return HFEmbeddingEncoder(
                tc.model_name,
                max_tokens=tc.max_tokens,
                pad_to_bucket=tc.pad_to_bucket,
            )
        except Exception as e:  # weights unavailable -> deterministic fallback
            print(f"[text] HF encoder unavailable ({e}); falling back to hash")
    return HashTextEncoder(
        dim=config.model.context_dim,
        max_tokens=tc.max_tokens,
        pad_to_bucket=tc.pad_to_bucket,
        seed=config.seed,
    )


def encode_captions(captions: dict, encoder: TextEncoder, out_path):
    """Offline caption-embedding cache builder
    (`/root/reference/text_preprocess.py:9-24`): {pdb_id: caption} -> npz of
    per-id (T_i, D) embeddings + true lengths."""
    arrays = {}
    for pid, caption in captions.items():
        emb, mask = encoder.encode([caption])
        t = int(mask[0].sum())
        arrays[pid] = emb[0, : max(t, 1)]
        arrays[f"{pid}__len"] = np.asarray(max(t, 1))
    np.savez_compressed(out_path, **arrays)
    return out_path
