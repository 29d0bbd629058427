"""Causal-LM wrapper with prefix query embeddings.

The reference carries a modified HF Llama whose only change is an added
`query_embeds` input concatenated BEFORE the token embeddings
(BLIP-2/MiniGPT-4 style, `/root/reference/model/modeling_llama.py:473,499-501`)
— though the training/sampling path only ever uses the raw embedding table.
This module provides the same capability against stock transformers (no
vendored model copy): `embed_with_query(model, input_ids, query_embeds)`
builds the concatenated `inputs_embeds` (+ attention mask) that the modified
forward would consume, and `generate_with_query` runs generation from it.

Works with any HF causal LM (Llama/Vicuna included) loaded from local files;
no network access is required beyond model loading itself.
"""

from __future__ import annotations


def embed_with_query(model, input_ids, query_embeds=None, attention_mask=None):
    """Token ids (+ optional query prefix) -> (inputs_embeds, attention_mask).

    Mirrors the reference's modified `LlamaModel.forward` prologue: embed the
    tokens with the model's embedding table, then concatenate `query_embeds`
    in front (`model/modeling_llama.py:499-501`).
    """
    import torch

    embed_tokens = model.get_input_embeddings()
    inputs_embeds = embed_tokens(input_ids)
    if attention_mask is None:
        attention_mask = torch.ones(
            input_ids.shape, dtype=torch.long, device=input_ids.device
        )
    if query_embeds is not None:
        query_embeds = query_embeds.to(inputs_embeds.dtype)
        inputs_embeds = torch.cat([query_embeds, inputs_embeds], dim=1)
        prefix_mask = torch.ones(
            query_embeds.shape[:2], dtype=attention_mask.dtype,
            device=attention_mask.device,
        )
        attention_mask = torch.cat([prefix_mask, attention_mask], dim=1)
    return inputs_embeds, attention_mask


def forward_with_query(model, input_ids, query_embeds=None, **kwargs):
    """Run the causal LM on tokens with a query-embedding prefix."""
    inputs_embeds, attention_mask = embed_with_query(
        model, input_ids, query_embeds, kwargs.pop("attention_mask", None)
    )
    return model(
        inputs_embeds=inputs_embeds, attention_mask=attention_mask, **kwargs
    )


def generate_with_query(model, input_ids, query_embeds=None, **generate_kwargs):
    """Greedy/sampled generation conditioned on a query-embedding prefix."""
    inputs_embeds, attention_mask = embed_with_query(
        model, input_ids, query_embeds, generate_kwargs.pop("attention_mask", None)
    )
    return model.generate(
        inputs_embeds=inputs_embeds, attention_mask=attention_mask,
        **generate_kwargs,
    )
