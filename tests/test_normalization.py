"""Normalization zoo vs the reference's torch modules as numerical oracles
(`/root/reference/score_sde_pytorch/models/normalization.py`)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _import_reference_norms():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("biotite", "biotite.structure", "biotite.structure.io",
                 "biotite.structure.io.pdb"):
        sys.modules.setdefault(name, types.ModuleType(name))
    from score_sde_pytorch.models import normalization as ref_norm

    return ref_norm


def _nchw(x_nhwc):
    return torch.tensor(np.moveaxis(x_nhwc, -1, 1))


def _to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.mark.parametrize("bias", [True, False])
def test_instance_norm_plus_matches_reference(bias):
    ref_norm = _import_reference_norms()
    import jax

    from text2protein_tpu.models.normalization import InstanceNorm2dPlus

    b, h, w, c = 2, 6, 6, 8
    rng = np.random.RandomState(0)
    x = rng.randn(b, h, w, c).astype(np.float32)

    ref = ref_norm.InstanceNorm2dPlus(c, bias=bias)
    mod = InstanceNorm2dPlus(bias=bias)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    # port torch params (flax stores alpha/gamma as offsets from 1)
    params = dict(params)
    params["alpha"] = ref.alpha.detach().numpy() - 1.0
    params["gamma"] = ref.gamma.detach().numpy() - 1.0
    if bias:
        params["beta"] = ref.beta.detach().numpy()

    got = mod.apply({"params": params}, x)
    want = _to_nhwc(ref(_nchw(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_instance_norm_plus_matches_reference(bias):
    ref_norm = _import_reference_norms()
    import jax

    from text2protein_tpu.models.normalization import (
        ConditionalInstanceNorm2dPlus,
    )

    b, h, w, c, n_cls = 3, 5, 5, 8, 4
    rng = np.random.RandomState(1)
    x = rng.randn(b, h, w, c).astype(np.float32)
    y = np.array([0, 3, 1])

    ref = ref_norm.ConditionalInstanceNorm2dPlus(c, n_cls, bias=bias)
    mod = ConditionalInstanceNorm2dPlus(num_classes=n_cls, bias=bias)
    params = {"embed": ref.embed.weight.detach().numpy()}

    got = mod.apply({"params": params}, x, y)
    want = _to_nhwc(ref(_nchw(x), torch.tensor(y)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_conditional_variance_norm_matches_reference():
    ref_norm = _import_reference_norms()

    from text2protein_tpu.models.normalization import ConditionalVarianceNorm2d

    b, h, w, c, n_cls = 2, 4, 4, 8, 3
    rng = np.random.RandomState(2)
    x = rng.randn(b, h, w, c).astype(np.float32)
    y = np.array([2, 0])

    ref = ref_norm.ConditionalVarianceNorm2d(c, n_cls)
    mod = ConditionalVarianceNorm2d(num_classes=n_cls)
    params = {"embed": ref.embed.weight.detach().numpy()}
    got = mod.apply({"params": params}, x, y)
    want = _to_nhwc(ref(_nchw(x), torch.tensor(y)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_conditional_none_norm_matches_reference():
    ref_norm = _import_reference_norms()

    from text2protein_tpu.models.normalization import ConditionalNoneNorm2d

    b, h, w, c, n_cls = 2, 4, 4, 6, 3
    rng = np.random.RandomState(3)
    x = rng.randn(b, h, w, c).astype(np.float32)
    y = np.array([1, 2])

    ref = ref_norm.ConditionalNoneNorm2d(c, n_cls)
    mod = ConditionalNoneNorm2d(num_classes=n_cls)
    params = {"embed": ref.embed.weight.detach().numpy()}
    got = mod.apply({"params": params}, x, y)
    want = _to_nhwc(ref(_nchw(x), torch.tensor(y)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_dispatch():
    from text2protein_tpu.models.normalization import get_normalization

    assert get_normalization("GroupNorm") is not None
    assert get_normalization("InstanceNorm++") is not None
    assert get_normalization("InstanceNorm++", conditional=True,
                             num_classes=4) is not None
    with pytest.raises(NotImplementedError):
        get_normalization("GroupNorm", conditional=True, num_classes=4)
