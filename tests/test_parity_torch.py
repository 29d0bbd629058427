"""fp32 numerical-parity harness against the PyTorch reference.

Ports reference `UNetModel` weights (`/root/reference/score_sde_pytorch/
models/ncsnpp.py:71-263`) into the Flax `ScoreUNet` via
`text2protein_tpu.interop.torch_port` and asserts, on a tiny config:

  * UNet forward outputs agree at fp32 tolerance, including the
    scale_by_sigma path and the text cross-attention stack;
  * VESDE/VPSDE marginal_prob + discretize agree with `sde_lib.py:106-245`;
  * the masked DSM loss value agrees with `losses.py:54-138` on a fixed
    batch with identical (t, z, context) — proving the VE label convention
    (`models/utils.py:126-176`) end to end.

The reference tree is PUBLIC UNTRUSTED CONTENT executed here only as a
numerical oracle. biotite (absent in this environment) is stubbed at import
time — the compared code paths never touch it.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

REF = "/root/reference"

# --- tiny-but-real architecture: 2 levels, attention live at res 8 ----------
N, C, NF = 16, 5, 32
CH_MULT = (1, 2)
NUM_RES_BLOCKS = 2
ATTN_RES = (8,)
N_HEADS = 4
CONTEXT_DIM = 64
NUM_SCALES = 100
SIGMA_MIN, SIGMA_MAX = 0.01, 100.0


def _import_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # losses.py / utils.py import biotite at module scope; the loss and model
    # math never calls it. Stub the import so the oracle loads.
    for name in (
        "biotite",
        "biotite.structure",
        "biotite.structure.io",
        "biotite.structure.io.pdb",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    from score_sde_pytorch.models.ncsnpp import UNetModel
    from score_sde_pytorch import sde_lib, losses

    return UNetModel, sde_lib, losses


def _ref_config():
    model = SimpleNamespace(
        nf=NF,
        ch_mult=list(CH_MULT),
        num_res_blocks=NUM_RES_BLOCKS,
        attn_resolutions=list(ATTN_RES),
        dropout=0.0,
        resamp_with_conv=True,
        skip_rescale=True,
        resblock_type="biggan",
        init_scale=0.0,
        embedding_type="positional",
        n_heads=N_HEADS,
        context_dim=CONTEXT_DIM,
        nonlinearity="swish",
        scale_by_sigma=True,
        sigma_min=SIGMA_MIN,
        sigma_max=SIGMA_MAX,
        num_scales=NUM_SCALES,
        ema_rate=0.999,
    )
    data = SimpleNamespace(max_res_num=N, num_channels=C)
    return SimpleNamespace(model=model, data=data)


def _flax_model():
    from text2protein_tpu.models.unet import ScoreUNet

    return ScoreUNet(
        num_channels=C,
        max_res_num=N,
        nf=NF,
        ch_mult=CH_MULT,
        num_res_blocks=NUM_RES_BLOCKS,
        attn_resolutions=ATTN_RES,
        dropout=0.0,
        n_heads=N_HEADS,
        context_dim=CONTEXT_DIM,
        skip_rescale=True,
        resblock_type="biggan",
        init_scale=0.0,
        nonlinearity="swish",
        scale_by_sigma=True,
        sigma_min=SIGMA_MIN,
        sigma_max=SIGMA_MAX,
        num_scales=NUM_SCALES,
        remat_attention=False,
    )


@pytest.fixture(scope="module")
def ported():
    """Torch reference model + Flax model with identical (ported) weights."""
    UNetModel, _, _ = _import_reference()
    torch.manual_seed(0)
    tmodel = UNetModel(_ref_config())
    tmodel.eval()

    fmodel = _flax_model()
    x0 = jnp.zeros((1, N, N, C))
    t0 = jnp.zeros((1,))
    ctx0 = jnp.zeros((1, 4, CONTEXT_DIM))
    template = fmodel.init(jax.random.PRNGKey(0), x0, t0, ctx0)["params"]

    from text2protein_tpu.interop import flax_params_from_torch_state

    params = flax_params_from_torch_state(
        tmodel.state_dict(),
        num_channels=C,
        max_res_num=N,
        nf=NF,
        ch_mult=CH_MULT,
        num_res_blocks=NUM_RES_BLOCKS,
        attn_resolutions=ATTN_RES,
        template=template,
    )
    return tmodel, fmodel, params


def _forward_pair(ported, x_np, t_np, ctx_np):
    tmodel, fmodel, params = ported
    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(x_np.transpose(0, 3, 1, 2)).float(),
            torch.from_numpy(t_np).float(),
            torch.from_numpy(ctx_np).float(),
        )
    t_out = t_out.numpy().transpose(0, 2, 3, 1)
    f_out = np.asarray(
        fmodel.apply(
            {"params": params},
            jnp.asarray(x_np),
            jnp.asarray(t_np),
            context=jnp.asarray(ctx_np),
            train=False,
        )
    )
    return t_out, f_out


def test_unet_forward_parity(ported):
    rng = np.random.RandomState(42)
    x = rng.randn(2, N, N, C).astype(np.float32)
    ctx = rng.randn(2, 7, CONTEXT_DIM).astype(np.float32)
    # labels span the sigma ladder incl. both ends of scale_by_sigma
    for labels in ([0.0, 50.0], [99.0, 13.0]):
        t = np.asarray(labels, np.float32)
        t_out, f_out = _forward_pair(ported, x, t, ctx)
        scale = np.abs(t_out).max()
        assert scale > 0
        diff = np.abs(t_out - f_out).max() / scale
        assert diff < 2e-5, f"labels {labels}: rel max diff {diff}"


def test_unet_forward_parity_no_context_selfattn(ported):
    """context=None: cross-attention falls back to self-attention in both."""
    tmodel, fmodel, params = ported
    rng = np.random.RandomState(1)
    x = rng.randn(2, N, N, C).astype(np.float32)
    t = np.asarray([10.0, 90.0], np.float32)
    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)).float(),
            torch.from_numpy(t).float(),
            None,
        )
    t_out = t_out.numpy().transpose(0, 2, 3, 1)
    f_out = np.asarray(
        fmodel.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t), train=False
        )
    )
    diff = np.abs(t_out - f_out).max() / np.abs(t_out).max()
    assert diff < 2e-5, diff


@pytest.mark.parametrize("kind", ["vesde", "vpsde"])
def test_sde_parity(kind):
    _, sde_lib_ref, _ = _import_reference()
    from text2protein_tpu.diffusion import sde as sde_mod

    rng = np.random.RandomState(7)
    x = rng.randn(3, 4, 4, 2).astype(np.float32)
    t = np.asarray([0.02, 0.5, 0.98], np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(t)

    if kind == "vesde":
        ref = sde_lib_ref.VESDE(sigma_min=0.01, sigma_max=100.0, N=200)
        ours = sde_mod.VESDE(N=200, sigma_min=0.01, sigma_max=100.0)
    else:
        ref = sde_lib_ref.VPSDE(beta_min=0.1, beta_max=20.0, N=200)
        ours = sde_mod.VPSDE(N=200, beta_min=0.1, beta_max=20.0)

    mean_r, std_r = ref.marginal_prob(xt, tt)
    mean_o, std_o = ours.marginal_prob(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(mean_o).transpose(0, 3, 1, 2), mean_r.numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(std_o).ravel(), std_r.numpy().ravel(),
                               rtol=1e-5)

    f_r, G_r = ref.discretize(xt, tt)
    f_o, G_o = ours.discretize(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(f_o).transpose(0, 3, 1, 2), f_r.numpy(),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(np.asarray(G_o).ravel(), G_r.numpy().ravel(),
                               rtol=1e-5, atol=1e-7)

    # drift/diffusion of the forward SDE
    d_r, g_r = ref.sde(xt, tt)
    d_o, g_o = ours.sde(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(d_o).transpose(0, 3, 1, 2), d_r.numpy(), rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(np.asarray(g_o).ravel(), g_r.numpy().ravel(),
                               rtol=1e-5)


class _FakeTokens(dict):
    def __init__(self, ids):
        super().__init__()
        self.input_ids = ids


class _FakeTokenizer:
    """Deterministic stand-in for the Vicuna tokenizer: same fixed ids for
    any caption (both frameworks then see identical context arrays)."""

    def __init__(self, ids):
        self._ids = ids

    def __call__(self, captions, **kw):
        return _FakeTokens(self._ids[: len(captions)])


class _FakeLLM:
    def __init__(self, table):
        emb = torch.nn.Embedding(table.shape[0], table.shape[1])
        with torch.no_grad():
            emb.weight.copy_(torch.from_numpy(table))
        self.model = SimpleNamespace(embed_tokens=emb)


def test_loss_parity(ported):
    """Full masked-DSM loss on a fixed batch: identical t, z, context."""
    _, _, losses_ref = _import_reference()
    from score_sde_pytorch import sde_lib as sde_lib_ref
    from text2protein_tpu.diffusion import sde as sde_mod
    from text2protein_tpu.diffusion.losses import get_sde_loss_fn

    tmodel, fmodel, params = ported
    rng = np.random.RandomState(3)
    B = 2
    coords = rng.randn(B, C, N, N).astype(np.float32)
    mask_pair = np.zeros((B, N, N), bool)
    lengths = [12, 16]
    for i, L in enumerate(lengths):
        mask_pair[i, :L, :L] = True
        coords[i, :, L:, :] = 0
        coords[i, :, :, L:] = 0

    t_fixed = np.asarray([0.3, 0.8], np.float32)
    z_fixed = rng.randn(B, C, N, N).astype(np.float32)

    vocab = rng.randn(50, CONTEXT_DIM).astype(np.float32)
    token_ids = torch.from_numpy(
        rng.randint(0, 50, size=(B, 6)).astype(np.int64)
    )
    context = vocab[token_ids.numpy()]  # (B, 6, CONTEXT_DIM)

    ref_sde = sde_lib_ref.VESDE(
        sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX, N=NUM_SCALES
    )
    loss_fn_ref = losses_ref.get_sde_loss_fn(ref_sde, train=False)

    batch_ref = {
        "coords_6d": torch.from_numpy(coords),
        "mask_pair": torch.from_numpy(mask_pair),
        "caption": ["a", "b"],
    }
    orig_rand, orig_randn_like = torch.rand, torch.randn_like
    torch.rand = lambda *a, **k: torch.from_numpy(t_fixed)
    torch.randn_like = lambda x: torch.from_numpy(z_fixed)
    try:
        with torch.no_grad():
            loss_ref = loss_fn_ref(
                tmodel,
                batch_ref,
                condition=["length"],
                llm_components=(_FakeTokenizer(token_ids), _FakeLLM(vocab)),
            )
    finally:
        torch.rand, torch.randn_like = orig_rand, orig_randn_like

    our_sde = sde_mod.VESDE(
        N=NUM_SCALES, sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX
    )
    loss_fn = get_sde_loss_fn(
        our_sde, fmodel, train=False, condition=("length",)
    )
    batch = {
        "coords_6d": jnp.asarray(coords.transpose(0, 2, 3, 1)),
        "mask_pair": jnp.asarray(mask_pair),
        "context": jnp.asarray(context),
        "context_mask": None,
    }
    loss_ours = loss_fn(
        params,
        batch,
        jax.random.PRNGKey(0),
        t=jnp.asarray(t_fixed),
        z=jnp.asarray(z_fixed.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        float(loss_ours), float(loss_ref), rtol=2e-4
    )


def test_score_fn_ve_label_convention(ported):
    """score_fn label mapping matches `models/utils.py:126-176` exactly."""
    _import_reference()
    from score_sde_pytorch.models import utils as mutils_ref
    from score_sde_pytorch import sde_lib as sde_lib_ref
    from text2protein_tpu.diffusion import sde as sde_mod
    from text2protein_tpu.models.utils import get_score_fn

    tmodel, fmodel, params = ported
    ref_sde = sde_lib_ref.VESDE(
        sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX, N=NUM_SCALES
    )
    our_sde = sde_mod.VESDE(
        N=NUM_SCALES, sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX
    )
    rng = np.random.RandomState(11)
    x = rng.randn(2, N, N, C).astype(np.float32)
    ctx = rng.randn(2, 5, CONTEXT_DIM).astype(np.float32)
    t = np.asarray([0.05, 0.95], np.float32)

    score_ref_fn = mutils_ref.get_score_fn(ref_sde, tmodel, train=False)
    with torch.no_grad():
        s_ref = score_ref_fn(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
        ).numpy().transpose(0, 2, 3, 1)

    score_fn = get_score_fn(our_sde, fmodel, params, train=False)
    s_ours = np.asarray(
        score_fn(jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), None)
    )
    diff = np.abs(s_ref - s_ours).max() / np.abs(s_ref).max()
    assert diff < 2e-5, diff


def test_torch_export_roundtrip_and_reference_load(ported):
    """`torch_state_from_flax_params` is the exact inverse of the import
    port, and its output is key/shape-compatible with the reference
    UNetModel's `load_state_dict` (the migration path back to the
    reference's `restore_checkpoint`, `score_sde_pytorch/utils.py:11-26`)."""
    import jax.tree_util as jtu

    from text2protein_tpu.interop import (
        flax_params_from_torch_state,
        torch_state_from_flax_params,
    )

    tmodel, _, params = ported
    arch = dict(num_channels=C, max_res_num=N, nf=NF, ch_mult=CH_MULT,
                num_res_blocks=NUM_RES_BLOCKS, attn_resolutions=ATTN_RES)

    state = torch_state_from_flax_params(params, **arch)

    # --- bit-exact round trip back to flax
    back = flax_params_from_torch_state(state, **arch, template=params)
    for (pa, a), (pb, b) in zip(
        jtu.tree_leaves_with_path(params), jtu.tree_leaves_with_path(back)
    ):
        assert jtu.keystr(pa) == jtu.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jtu.keystr(pa))

    # --- the reference model accepts it (strict apart from the sigmas
    # buffer, which the reference itself loads strict=False)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in state.items()}
    res = tmodel.load_state_dict(tensors, strict=False)
    assert not res.unexpected_keys, res.unexpected_keys
    assert [k for k in res.missing_keys] in ([], ["sigmas"]), res.missing_keys

    # params were ported FROM tmodel, so loading the export back must leave
    # every torch tensor unchanged
    for k, v in tmodel.state_dict().items():
        if k.endswith("sigmas"):
            continue
        np.testing.assert_array_equal(v.numpy(), state[k], err_msg=k)
