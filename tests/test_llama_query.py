"""Query-embeds LLM wrapper against a tiny randomly-initialized Llama (built
from config — no downloads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = transformers.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, vocab_size=128,
        max_position_embeddings=64,
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def test_embed_with_query_concatenates(tiny_llama):
    from text2protein_tpu.text.llama import embed_with_query

    ids = torch.randint(0, 128, (2, 5))
    q = torch.randn(2, 3, 32)
    embeds, mask = embed_with_query(tiny_llama, ids, q)
    assert embeds.shape == (2, 8, 32)
    assert mask.shape == (2, 8)
    # prefix rows are exactly the query embeddings
    np.testing.assert_allclose(
        embeds[:, :3].detach().numpy(), q.numpy(), atol=1e-6
    )
    # suffix rows are the token-table embeddings
    table = tiny_llama.get_input_embeddings()(ids)
    np.testing.assert_allclose(
        embeds[:, 3:].detach().numpy(), table.detach().numpy(), atol=1e-6
    )


@pytest.fixture(scope="module")
def tiny_checkpoint(tiny_llama, tmp_path_factory):
    """A real on-disk HF checkpoint (safetensors) + fast tokenizer, built
    offline: the smallest thing HFEmbeddingEncoder's partial load can read."""
    tokenizers = pytest.importorskip("tokenizers")

    d = tmp_path_factory.mktemp("tiny_llama_ckpt")
    tiny_llama.save_pretrained(d)

    vocab = {"<unk>": 0, "<pad>": 1, "alpha": 2, "helix": 3, "bundle": 4,
             "protein": 5, "beta": 6, "sheet": 7}
    tok = tokenizers.Tokenizer(tokenizers.models.WordLevel(vocab, "<unk>"))
    tok.pre_tokenizer = tokenizers.pre_tokenizers.Whitespace()
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", pad_token="<pad>"
    )
    fast.save_pretrained(d)
    return d


def test_hf_encoder_partial_load(tiny_llama, tiny_checkpoint):
    """HFEmbeddingEncoder reads ONLY the embedding table from the checkpoint
    (VERDICT round-1 #8: no full-model materialization) and reproduces the
    model's own embed_tokens lookups through a real HF tokenizer."""
    from text2protein_tpu.text.encoder import HFEmbeddingEncoder

    enc = HFEmbeddingEncoder(str(tiny_checkpoint), max_tokens=16,
                             pad_to_bucket=8)
    assert enc.dim == 32
    emb, mask = enc.encode(["alpha helix bundle", "beta sheet protein xyz"])
    assert emb.shape == (2, 8, 32) and mask.shape == (2, 8)
    assert mask[0].sum() == 3 and mask[1].sum() == 4  # xyz -> <unk>

    table = tiny_llama.get_input_embeddings().weight.detach().numpy()
    np.testing.assert_allclose(emb[0, :3], table[[2, 3, 4]], atol=1e-6)
    np.testing.assert_allclose(emb[1, :4], table[[6, 7, 5, 0]], atol=1e-6)
    # position 3 of caption 0 is the tokenizer's <pad> embedding (masked
    # downstream by the pad-aware cross-attention); bucket padding is zero
    np.testing.assert_allclose(emb[0, 3], table[1], atol=1e-6)
    assert np.all(emb[:, 4:] == 0)


def test_forward_with_query_changes_logits(tiny_llama):
    from text2protein_tpu.text.llama import forward_with_query

    ids = torch.randint(0, 128, (1, 6))
    with torch.no_grad():
        out_plain = forward_with_query(tiny_llama, ids, None)
        out_q = forward_with_query(tiny_llama, ids, torch.randn(1, 2, 32))
    assert out_plain.logits.shape == (1, 6, 128)
    assert out_q.logits.shape == (1, 8, 128)
    # the prefix must influence the suffix predictions (causal attention)
    d = (out_q.logits[:, -1] - out_plain.logits[:, -1]).abs().max().item()
    assert d > 1e-5
