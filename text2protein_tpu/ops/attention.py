"""Fused multi-head attention dispatch.

The reference materializes full O((HW)^2) attention logits on one device
(`/root/reference/score_sde_pytorch/models/layers.py:160-176`) and a separate
einsum cross-attention (`/root/reference/model/attention.py:152-193`). Here a
single entry point serves both:

  * on TPU, a Pallas flash-attention kernel (`flash.py`) — blockwise online
    softmax, logits never hit HBM — wrapped in a custom VJP: the backward is
    the dedicated Pallas dq/dk/dv kernel (recompute-from-logsumexp in VMEM);
    shapes the backward kernel does not support fall back to recomputing
    attention via the XLA path and differentiating it;
  * elsewhere (CPU tests) or for unsupported shapes, the XLA einsum path.

Layout: q (B, H, Tq, D), k/v (B, H, Tk, D); optional kv_mask (B, Tk) bool.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = float("-inf")


def _xla_attention(q, k, v, scale, kv_mask=None):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if kv_mask is not None:
        bias = jnp.where(kv_mask[:, None, None, :], 0.0, _NEG_INF)
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flash_op(scale, masked, q, k, v, maskf):
    from .flash import flash_attention

    return flash_attention(
        q, k, v, scale=scale, kv_mask=(maskf if masked else None)
    )


def _flash_op_fwd(scale, masked, q, k, v, maskf):
    from .flash import flash_attention_fwd

    out, lse = flash_attention_fwd(
        q, k, v, scale=scale, kv_mask=(maskf if masked else None)
    )
    return out, (q, k, v, maskf, out, lse)


def _flash_op_bwd(scale, masked, residuals, g):
    q, k, v, maskf, out, lse = residuals
    from .flash import flash_attention_bwd, supports_bwd

    if supports_bwd(q, k, v):
        dq, dk, dv = flash_attention_bwd(
            q, k, v, out, lse, g, scale=scale,
            kv_mask=(maskf if masked else None),
        )
        return dq, dk, dv, jnp.zeros_like(maskf)

    # fallback: recompute attention via the XLA path and differentiate it
    def ref(q_, k_, v_):
        mask = (maskf > 0.5) if masked else None
        return _xla_attention(q_, k_, v_, scale, kv_mask=mask)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(maskf)


_flash_op.defvjp(_flash_op_fwd, _flash_op_bwd)


_BACKEND_OVERRIDE = None  # None = auto, else "xla" | "pallas"


def set_backend(backend):
    """Force the attention backend: 'xla', 'pallas', or None (auto by
    platform). Needed when compiling for a non-default backend in a process
    whose default device is a TPU (e.g. the virtual-CPU mesh dryrun)."""
    global _BACKEND_OVERRIDE
    assert backend in (None, "xla", "pallas")
    _BACKEND_OVERRIDE = backend


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def dot_product_attention(q, k, v, scale=None, kv_mask=None, use_pallas=None):
    """Scaled dot-product attention.

    Args:
      q: (B, H, Tq, D); k, v: (B, H, Tk, D).
      scale: logit scale; defaults to D**-0.5.
      kv_mask: optional (B, Tk) bool, True = attend (padded caption tokens).
      use_pallas: force kernel choice; None = auto (TPU and shapes permit).
    Returns:
      (B, H, Tq, D).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        if _BACKEND_OVERRIDE is not None:
            use_pallas = _BACKEND_OVERRIDE == "pallas"
        else:
            use_pallas = _on_tpu()
    if use_pallas:
        from .flash import supports

        if supports(q, k, v):
            masked = kv_mask is not None
            maskf = (
                kv_mask.astype(jnp.float32)
                if masked
                else jnp.ones((q.shape[0], 128), jnp.float32)
            )
            return _flash_op(float(scale), masked, q, k, v, maskf)
    return _xla_attention(q, k, v, scale, kv_mask=kv_mask)
