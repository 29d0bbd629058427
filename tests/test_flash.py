"""Pallas flash-attention kernel vs fp32 oracle (interpret mode on CPU).

On real TPU the kernel runs compiled; max-abs error vs an fp64 oracle is at
the bf16-MXU input-rounding level (~1e-2 on N(0,1) inputs), verified on
hardware. Here the interpreter checks the online-softmax algebra exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import text2protein_tpu.ops.flash as flash_mod
from text2protein_tpu.ops.attention import _xla_attention


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        flash_mod.pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    # bypass the jit wrappers so the monkeypatched pallas_call is picked up
    monkeypatch.setattr(
        flash_mod, "flash_attention_fwd",
        flash_mod.flash_attention_fwd.__wrapped__,
    )
    monkeypatch.setattr(
        flash_mod, "flash_attention_bwd",
        flash_mod.flash_attention_bwd.__wrapped__,
    )
    yield


@pytest.mark.parametrize(
    "b,h,tq,tk,d",
    [
        (1, 1, 64, 64, 32),
        (2, 2, 128, 64, 16),
        (1, 2, 256, 512, 32),  # multiple k blocks
        (2, 1, 512, 96, 8),
    ],
)
def test_flash_matches_xla(interpret_pallas, b, h, tq, tk, d):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, tq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, tk, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, tk, d))
    assert flash_mod.supports(q, k, v)
    got = flash_mod.flash_attention(q, k, v, scale=d**-0.5)
    want = _xla_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_flash_masked(interpret_pallas):
    b, h, tq, tk, d = 2, 2, 64, 128, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, tq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, tk, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, tk, d))
    mask = jnp.tile(jnp.arange(tk)[None, :] < 37, (b, 1))
    mask = mask.at[1].set(jnp.arange(tk) < 100)  # per-sample lengths
    got = flash_mod.flash_attention(q, k, v, scale=d**-0.5, kv_mask=mask)
    want = _xla_attention(q, k, v, d**-0.5, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_supports_rejects_bad_shapes():
    q = jnp.zeros((1, 1, 7, 32))  # Tq < 8
    assert not flash_mod.supports(q, q, q)
    q = jnp.zeros((1, 1, 64, 12))  # d % 8 != 0
    assert not flash_mod.supports(q, q, q)


@pytest.mark.parametrize(
    "b,h,tq,tk,d,masked",
    [
        (1, 2, 64, 64, 16, True),
        (2, 1, 128, 64, 32, False),
        (1, 2, 256, 512, 32, True),   # cross-attention shape
        (1, 1, 1024, 1024, 64, False),  # N=256 grid self-attention shape
    ],
)
def test_flash_bwd_kernel_matches_xla_grads(interpret_pallas, b, h, tq, tk,
                                            d, masked):
    """The dedicated Pallas backward kernel (dQ/dK/dV from saved logsumexp)
    must match the XLA attention's gradients."""
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, tq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, tk, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, tk, d))
    mask = jnp.tile(jnp.arange(tk)[None, :] < (tk * 3) // 4, (b, 1)) if masked else None
    assert flash_mod.supports_bwd(q, k, v)

    out, lse = flash_mod.flash_attention_fwd(q, k, v, scale=d**-0.5,
                                             kv_mask=mask)
    g = jax.random.normal(jax.random.PRNGKey(3), out.shape)
    dq, dk, dv = flash_mod.flash_attention_bwd(
        q, k, v, out, lse, g, scale=d**-0.5, kv_mask=mask
    )

    def ref(q_, k_, v_):
        return _xla_attention(q_, k_, v_, d**-0.5, kv_mask=mask)

    want_out, vjp = jax.vjp(ref, q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=1e-5)
    for got, want in zip((dq, dk, dv), vjp(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)


def test_bwd_vmem_bound_falls_back():
    q = jnp.zeros((1, 1, 4096, 64))
    assert not flash_mod.supports_bwd(q, q, q)  # 67 MB logits block


def test_flash_custom_vjp_matches_xla_grads(interpret_pallas):
    """Training path: gradient of the Pallas-forward op must match the XLA
    attention's gradient (Pallas backward kernel where shapes allow)."""
    import text2protein_tpu.ops.attention as attn_mod

    b, h, tq, tk, d = 1, 2, 64, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, tq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, tk, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, tk, d))
    mask = jnp.tile(jnp.arange(tk)[None, :] < 40, (b, 1))

    def loss_pallas(q, k, v):
        out = attn_mod.dot_product_attention(
            q, k, v, kv_mask=mask, use_pallas=True
        )
        return jnp.sum(out**2)

    def loss_xla(q, k, v):
        out = attn_mod.dot_product_attention(
            q, k, v, kv_mask=mask, use_pallas=False
        )
        return jnp.sum(out**2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
