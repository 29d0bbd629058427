"""LDM-style cross-attention stack (Flax linen).

Re-design of `/root/reference/model/attention.py:152-263`: SpatialTransformer
(GroupNorm -> 1x1 proj_in -> flatten HW to tokens -> transformer blocks ->
zero-init 1x1 proj_out + residual) with BasicTransformerBlock = pre-LN
self-attention, cross-attention over text context, GEGLU feed-forward. Both
attentions go through the fused Pallas/XLA attention op; the text key-padding
mask is honored (the reference attends to pad embeddings).

Gradient checkpointing: the reference wraps each block in a custom autograd
Function (`/root/reference/model/ldm_utils.py:102-148`); here `nn.remat` on
the block serves the same purpose under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


class GEGLU(nn.Module):
    dim_out: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2, dtype=self.dtype)(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, train=False):
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype)(x)
        else:
            x = nn.gelu(nn.Dense(inner, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(dim, dtype=self.dtype)(x)


class CrossAttention(nn.Module):
    """Multi-head attention; context=None -> self-attention
    (`/root/reference/model/attention.py:152-193`)."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, train=False):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        tk = ctx.shape[1]

        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(ctx)

        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, tk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        out = dot_product_attention(
            q, k, v, scale=self.dim_head**-0.5, kv_mask=context_mask
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(x.shape[-1], name="to_out", dtype=self.dtype)(out)
        return nn.Dropout(self.dropout)(out, deterministic=not train)


class BasicTransformerBlock(nn.Module):
    n_heads: int
    d_head: int
    dropout: float = 0.0
    gated_ff: bool = True
    dtype: object = None
    norm_dtype: object = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, train=False):
        # LayerNorms stay float32: token tensors are small (<=1024 x C), so
        # their traffic is negligible next to the grid tensors.
        ln = lambda name: nn.LayerNorm(name=name, dtype=jnp.float32)
        x = CrossAttention(
            heads=self.n_heads, dim_head=self.d_head, dropout=self.dropout,
            name="attn1", dtype=self.dtype,
        )(ln("norm1")(x), train=train) + x
        x = CrossAttention(
            heads=self.n_heads, dim_head=self.d_head, dropout=self.dropout,
            name="attn2", dtype=self.dtype,
        )(
            ln("norm2")(x),
            context=context,
            context_mask=context_mask,
            train=train,
        ) + x
        x = FeedForward(glu=self.gated_ff, dropout=self.dropout, name="ff",
                        dtype=self.dtype)(
            ln("norm3")(x), train=train
        ) + x
        return x


class SpatialTransformer(nn.Module):
    """Transformer over the flattened HW token grid with text cross-attention
    (`/root/reference/model/attention.py:218-263`)."""

    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    remat: bool = True
    dtype: object = None
    norm_dtype: object = None

    @nn.compact
    def __call__(self, x, context=None, context_mask=None, train=False):
        b, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        # Reference uses 32 groups unconditionally (channels are always >=128
        # there); capped for small channel counts.
        from .layers import GroupNormF32Stats

        x = GroupNormF32Stats(
            num_groups=min(32, c), epsilon=1e-6, name="norm",
            follow_input_dtype=(
                self.norm_dtype is not None and self.norm_dtype != jnp.float32
            ),
        )(x)
        x = nn.Dense(inner, name="proj_in", dtype=self.dtype)(x)
        x = x.reshape(b, h * w, inner)
        block_cls = (
            nn.remat(BasicTransformerBlock, static_argnums=(4,))
            if self.remat
            else BasicTransformerBlock
        )
        for d in range(self.depth):
            x = block_cls(
                n_heads=self.n_heads,
                d_head=self.d_head,
                dropout=self.dropout,
                dtype=self.dtype,
                norm_dtype=self.norm_dtype,
                name=f"block_{d}",
            )(x, context, context_mask, train)
        x = x.reshape(b, h, w, inner)
        x = nn.Dense(
            c,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_out",
            dtype=self.dtype,
        )(x)
        return x + x_in.astype(x.dtype)
