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
