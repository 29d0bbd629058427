"""Pallas TPU flash attention (blockwise online-softmax).

Serves both attention flavors of the score UNet:
  * grid self-attention over HW tokens — the reference materializes the full
    (B, H, W, H*W) logits tensor (`/root/reference/score_sde_pytorch/models/
    layers.py:167-171`);
  * text cross-attention over caption tokens (`/root/reference/model/
    attention.py:180-191`), with a key-padding mask (the reference silently
    attends to pad embeddings; we mask — see kv_mask).

Logits never leave VMEM: per (batch*head, q-block) grid cell, the kernel
streams k/v blocks and maintains running max / normalizer / accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_BQ = 256
_DEFAULT_BK = 512


def _choose_block(t: int, pref: int) -> int:
    if t <= pref:
        return t
    for b in (pref, 256, 128, 64):
        if t % b == 0:
            return b
    return 0  # no clean blocking


def supports(q, k, v) -> bool:
    """Whether the Pallas kernel handles these shapes (else XLA path)."""
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        return False
    _, _, tq, d = q.shape
    tk = k.shape[2]
    if d % 8 != 0 or d > 1024:
        return False
    if tq < 8 or tk < 8:
        return False
    return _choose_block(tq, _DEFAULT_BQ) > 0 and _choose_block(tk, _DEFAULT_BK) > 0


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref, *, scale, bk,
                  nk, masked, h):
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    bq, d = q.shape
    b_idx = pl.program_id(0) // h  # batch row of the (full) mask array

    m0 = jnp.full((bq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)  # (bk, d)
        vb = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        if masked:
            mb = mask_ref[b_idx, pl.ds(i * bk, bk)].astype(jnp.float32)  # (bk,)
            s = s + (mb[None, :] - 1.0) * 1e30  # masked -> -1e30
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if masked:
            p = p * mb[None, :]  # robust even for fully-masked blocks
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # logsumexp rows for the backward kernel (the flash-bwd residual)
    l_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))  # (bq, 1)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention_fwd(q, k, v, scale=None, kv_mask=None):
    """Forward pass returning (out, logsumexp-rows) — the flash residuals.

    q: (B, H, Tq, D); k, v: (B, H, Tk, D); kv_mask: (B, Tk) bool or None.
    Returns out (B, H, Tq, D) and L (B*H, Tq, 1) float32.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = d**-0.5
    bq = _choose_block(tq, _DEFAULT_BQ)
    bk = _choose_block(tk, _DEFAULT_BK)
    nk = tk // bk

    qr = q.reshape(b * h, tq, d)
    kr = k.reshape(b * h, tk, d)
    vr = v.reshape(b * h, tk, d)
    masked = kv_mask is not None
    if masked:
        mr = kv_mask.astype(jnp.float32)  # (B, Tk)
    else:
        mr = jnp.ones((b, 128), jnp.float32)  # placeholder, unread

    grid = (b * h, tq // bq)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, bk=bk, nk=nk, masked=masked, h=h
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            # Full mask array resident in VMEM; the kernel indexes its batch
            # row dynamically (a (1, Tk) block would violate TPU tiling).
            pl.BlockSpec(mr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            # trailing singleton keeps the (sublane, lane) block dims legal
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(qr.size + kr.size + vr.size) * qr.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(qr, kr, vr, mr)
    return out.reshape(b, h, tq, d), lse


def flash_attention(q, k, v, scale=None, kv_mask=None):
    """q: (B, H, Tq, D); k, v: (B, H, Tk, D); kv_mask: (B, Tk) bool or None."""
    return flash_attention_fwd(q, k, v, scale=scale, kv_mask=kv_mask)[0]


# --------------------------------------------------------------- backward
# One-shot kernel per (batch*head): at this framework's attention sizes
# (grid self-attn <= 32^2 = 1024 tokens even at N=256; text cross-attn
# <= 512 tokens) the full (Tq, Tk) logits block fits VMEM comfortably, so
# the backward recomputes P = exp(S - L) once from the saved logsumexp and
# forms dQ/dK/dV with plain MXU matmuls — no online softmax needed.


def supports_bwd(q, k, v) -> bool:
    _, _, tq, d = q.shape
    tk = k.shape[2]
    if not supports(q, k, v):
        return False
    if tq % 8 != 0 or tk % 64 != 0:
        return False
    # full logits block in f32 + q/k/v/do residents must fit VMEM
    vmem = 4 * (tq * tk + 2 * tq * d + 3 * tk * d + 2 * tq)
    return vmem <= 10 * 1024 * 1024


def _flash_bwd_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, mask_ref,
                      dq_ref, dk_ref, dv_ref, *, scale, masked, h):
    f32 = jnp.float32
    q = q_ref[0].astype(f32)      # (tq, d)
    k = k_ref[0].astype(f32)      # (tk, d)
    v = v_ref[0].astype(f32)
    do = do_ref[0].astype(f32)    # (tq, d)
    lse = l_ref[0]       # (tq, 1)
    delta = delta_ref[0]  # (tq, 1) = rowsum(dO * O)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ) * scale                      # (tq, tk)
    if masked:
        # bias BEFORE exp, like the forward kernel: a padded key whose raw
        # logit exceeds the (mask-aware) logsumexp would overflow exp(s-lse)
        # to inf, and inf * 0 = NaN would poison every gradient
        b_idx = pl.program_id(0) // h
        mb = mask_ref[b_idx].astype(f32)   # (tk,)
        s = s + (mb[None, :] - 1.0) * 1e30
    p = jnp.exp(s - lse)
    # dV = P^T dO
    dv_ref[0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(dv_ref.dtype)
    # dP = dO V^T ; dS = P * (dP - delta) * scale
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    ds = p * (dp - delta) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(dk_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention_bwd(q, k, v, out, lse, g, scale=None, kv_mask=None):
    """dQ/dK/dV from the saved forward residuals (out, logsumexp rows)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = d**-0.5
    qr = q.reshape(b * h, tq, d)
    kr = k.reshape(b * h, tk, d)
    vr = v.reshape(b * h, tk, d)
    dor = g.reshape(b * h, tq, d)
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(b * h, tq, 1)
    masked = kv_mask is not None
    mr = (
        kv_mask.astype(jnp.float32)
        if masked
        else jnp.ones((b, 128), jnp.float32)
    )

    full = lambda i: (i, 0, 0)  # noqa: E731
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale, masked=masked, h=h),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tq, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, tk, d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * tq * tk * d,
            bytes_accessed=3 * (qr.size + kr.size + vr.size) * qr.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(qr, kr, vr, dor, lse, delta, mr)
    return (
        dq.reshape(b, h, tq, d),
        dk.reshape(b, h, tk, d),
        dv.reshape(b, h, tk, d),
    )
