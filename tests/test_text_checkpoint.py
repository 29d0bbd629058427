"""Execute the real-checkpoint text-embedding path (VERDICT r2 #5).

Round 2's `HFEmbeddingEncoder` partial-load (`text/encoder.py`) had never run
against actual checkpoint files. These tests save a tiny from-config Llama
to disk in each layout the loader handles — single-file safetensors, sharded
safetensors with index json, and pytorch_model.bin — plus a local word-level
tokenizer, then load through the public `build_text_encoder`/
`HFEmbeddingEncoder` path and assert the returned embeddings equal the
model's own `embed_tokens` rows (the semantics of
`/root/reference/train.py:108-112` / `losses.py:96-103`).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    """A tiny Llama checkpoint dir (single-file safetensors) + tokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    d = tmp_path_factory.mktemp("tiny_llama")
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)

    words = ["<unk>", "<pad>", "synthetic", "alpha", "helical", "bundle",
             "protein", "with", "helices", "and", "residues"] + [
        str(n) for n in range(10)
    ]
    tok = Tokenizer(models.WordLevel({w: i for i, w in enumerate(words)},
                                     unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", pad_token="<pad>"
    ).save_pretrained(d)
    return d, model


def _expected(model, dirpath, captions, max_tokens=16):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(str(dirpath))
    enc = tok(captions, return_tensors="pt", add_special_tokens=False,
              max_length=max_tokens, padding=True, truncation=True)
    with torch.no_grad():
        emb = model.get_input_embeddings()(enc.input_ids).float().numpy()
    return emb, enc.attention_mask.bool().numpy()


def _check_encoder(dirpath, model):
    from text2protein_tpu.text.encoder import HFEmbeddingEncoder

    enc = HFEmbeddingEncoder(str(dirpath), max_tokens=16, pad_to_bucket=8)
    captions = ["synthetic alpha helical bundle protein with 3 helices",
                "protein with 128 residues"]
    emb, mask = enc.encode(captions)
    exp_emb, exp_mask = _expected(model, dirpath, captions)
    assert emb.shape[0] == 2 and emb.shape[2] == 32
    t = exp_emb.shape[1]
    assert emb.shape[1] >= t and emb.shape[1] % 8 == 0
    np.testing.assert_allclose(emb[:, :t], exp_emb, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(mask[:, :t], exp_mask)
    assert not mask[:, t:].any()
    assert not emb[:, t:].any()


def test_single_file_safetensors(tiny_llama_dir):
    d, model = tiny_llama_dir
    _check_encoder(d, model)


def test_sharded_safetensors_index(tiny_llama_dir, tmp_path):
    d, model = tiny_llama_dir
    sharded = tmp_path / "sharded"
    model.save_pretrained(sharded, safe_serialization=True,
                          max_shard_size="20KB")
    index = sharded / "model.safetensors.index.json"
    assert index.exists(), "expected a sharded checkpoint with an index"
    weight_map = json.load(open(index))["weight_map"]
    assert "model.embed_tokens.weight" in weight_map
    # tokenizer files come from the original dir
    for f in d.iterdir():
        if "token" in f.name:
            (sharded / f.name).write_bytes(f.read_bytes())
    _check_encoder(sharded, model)


def test_pytorch_bin_fallback(tiny_llama_dir, tmp_path):
    d, model = tiny_llama_dir
    bindir = tmp_path / "binfmt"
    model.save_pretrained(bindir, safe_serialization=False)
    assert (bindir / "pytorch_model.bin").exists()
    for f in d.iterdir():
        if "token" in f.name:
            (bindir / f.name).write_bytes(f.read_bytes())
    _check_encoder(bindir, model)


def test_build_text_encoder_hf_kind(tiny_llama_dir):
    """config text.encoder: hf resolves to the real-checkpoint path when the
    weights exist (no silent hash fallback)."""
    from text2protein_tpu.config import load_config
    from text2protein_tpu.text import build_text_encoder
    from text2protein_tpu.text.encoder import HFEmbeddingEncoder

    d, _ = tiny_llama_dir
    config = load_config("configs/quality_l128.yml")
    config.text.encoder = "hf"
    config.text.model_name = str(d)
    config.text.max_tokens = 16
    config.text.pad_to_bucket = 8
    enc = build_text_encoder(config)
    assert isinstance(enc, HFEmbeddingEncoder)
    assert enc.dim == 32
