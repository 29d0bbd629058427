"""Golden tests for the 6D featurization against closed-form geometry and a
direct numpy re-derivation of the reference's sparse-scatter semantics."""

import numpy as np
import pytest
import scipy.spatial

from text2protein_tpu.data.featurize import (
    get_coords6d,
    get_coords6d_jax,
    virtual_cb,
    featurize_structure,
)


def make_helix(L=24, rise=1.5, radius=2.3, turn=100.0):
    """Synthetic poly-CA helix with ideal-ish backbone geometry."""
    rng = np.random.RandomState(0)
    t = np.deg2rad(turn) * np.arange(L)
    ca = np.stack(
        [radius * np.cos(t), radius * np.sin(t), rise * np.arange(L)], axis=-1
    )
    # N and C slightly offset from CA along plausible directions
    n = ca + np.array([0.8, -1.0, -0.6]) + rng.randn(L, 3) * 0.01
    c = ca + np.array([-0.6, 1.0, 0.8]) + rng.randn(L, 3) * 0.01
    return np.stack([n, ca, c], axis=1)  # (L, 3, 3)


def reference_coords6d(xyz, dmax=20.0):
    """Direct numpy transcription of the reference's sparse algorithm
    (`/root/reference/dataset.py:396-450`), kept here as the golden oracle."""
    import math

    nres = xyz.shape[0]
    N = xyz[:, 0]
    Ca = xyz[:, 1]
    C = xyz[:, 2]
    b = Ca - N
    c = C - Ca
    a = np.cross(b, c)
    Cb = -0.58273431 * a + 0.56802827 * b - 0.54067466 * c + Ca

    kd = scipy.spatial.cKDTree(Cb)
    indices = kd.query_ball_tree(kd, dmax)
    idx = np.array(
        [[i, j] for i in range(len(indices)) for j in indices[i] if i != j]
    ).T
    idx0, idx1 = idx[0], idx[1]

    def dihedrals(a_, b_, c_, d_):
        b0 = -1.0 * (b_ - a_)
        b1 = c_ - b_
        b2 = d_ - c_
        b1 = b1 / np.linalg.norm(b1, axis=-1)[:, None]
        v = b0 - np.sum(b0 * b1, axis=-1)[:, None] * b1
        w = b2 - np.sum(b2 * b1, axis=-1)[:, None] * b1
        x = np.sum(v * w, axis=-1)
        y = np.sum(np.cross(b1, v) * w, axis=-1)
        return np.arctan2(y, x)

    def angles(a_, b_, c_):
        v = a_ - b_
        v /= np.linalg.norm(v, axis=-1)[:, None]
        w = c_ - b_
        w /= np.linalg.norm(w, axis=-1)[:, None]
        return np.arccos(np.sum(v * w, axis=1))

    dist6d = np.full((nres, nres), dmax).astype(float)
    dist6d[idx0, idx1] = np.linalg.norm(Cb[idx1] - Cb[idx0], axis=-1)
    omega6d = np.zeros((nres, nres))
    omega6d[idx0, idx1] = dihedrals(Ca[idx0], Cb[idx0], Cb[idx1], Ca[idx1])
    theta6d = np.zeros((nres, nres))
    theta6d[idx0, idx1] = dihedrals(N[idx0], Ca[idx0], Cb[idx0], Cb[idx1])
    phi6d = np.zeros((nres, nres))
    phi6d[idx0, idx1] = angles(Ca[idx0], Cb[idx0], Cb[idx1])

    dist6d = (dist6d / dmax * 2) - 1
    omega6d = omega6d / math.pi
    theta6d = theta6d / math.pi
    phi6d = (phi6d / math.pi * 2) - 1
    return np.stack([dist6d, omega6d, theta6d, phi6d], axis=-1)


def test_matches_reference_sparse_algorithm():
    xyz = make_helix(32)
    got = get_coords6d(xyz)
    want = reference_coords6d(xyz)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_random_coords_match_reference():
    rng = np.random.RandomState(1)
    # Spread-out random "residues": a mix of pairs within and beyond dmax
    xyz = rng.randn(48, 1, 3) * 9.0 + rng.randn(48, 3, 3) * 1.5
    got = get_coords6d(xyz)
    want = reference_coords6d(xyz)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_jax_matches_numpy():
    xyz = make_helix(24)
    got = np.asarray(get_coords6d_jax(xyz.astype(np.float64)))
    want = get_coords6d(xyz)
    np.testing.assert_allclose(got, want, atol=2e-5)  # f32 on device


def test_out_of_range_fill_values():
    # Two residues 100 A apart: dist channel = 1 (dmax), angles 0 pre-norm
    xyz = np.zeros((2, 3, 3))
    xyz[0] = [[1.0, 0, 0], [0, 0, 0], [0, 1.0, 0]]
    xyz[1] = [[101.0, 0, 0], [100.0, 0, 0], [100.0, 1.0, 0]]
    out = get_coords6d(xyz)
    np.testing.assert_allclose(out[0, 1, 0], 1.0)  # dist = dmax -> 1
    np.testing.assert_allclose(out[0, 1, 1], 0.0)  # omega
    np.testing.assert_allclose(out[0, 1, 2], 0.0)  # theta
    np.testing.assert_allclose(out[0, 1, 3], -1.0)  # phi: 0 -> -1 after norm
    # diagonal excluded -> fill values too
    np.testing.assert_allclose(out[0, 0, 0], 1.0)


def test_cb_reconstruction_matches_constants():
    xyz = make_helix(8)
    cb = virtual_cb(xyz)
    n, ca, c = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    b = ca - n
    cc = c - ca
    a = np.cross(b, cc)
    want = -0.58273431 * a + 0.56802827 * b - 0.54067466 * cc + ca
    np.testing.assert_allclose(cb, want, atol=1e-12)


def test_featurize_structure_channels_and_mask():
    xyz = make_helix(40)
    mask = np.ones(40)
    mask[7] = 0  # a masked residue
    c6d, mask_pair, ss = featurize_structure(xyz, mask, ss_constraints=False)
    assert c6d.shape == (5, 40, 40)
    assert mask_pair.shape == (40, 40)
    # padding channel is all-ones inside the mask, 0 where masked
    np.testing.assert_allclose(c6d[-1], mask_pair.astype(np.float32))
    # masked rows/cols are zero in every channel
    assert np.all(c6d[:, 7, :] == 0)
    assert np.all(c6d[:, :, 7] == 0)
    # no NaNs anywhere
    assert np.isfinite(c6d).all()


def test_featurize_structure_ss_channels():
    xyz = make_helix(48)
    mask = np.ones(48)
    c6d, mask_pair, ss = featurize_structure(xyz, mask, ss_constraints=True)
    if c6d is None:
        pytest.skip("SS annotation rejected synthetic helix")
    assert c6d.shape == (8, 48, 48)
    # ss channels binary
    assert set(np.unique(c6d[4:7])) <= {0.0, 1.0}


def test_vary_placement_randomizes_block_boundaries():
    """--vary_placement must vary SS block placement at fixed (L, n_helices)
    — the equal-split default makes placement deterministic, which made
    placement steering unlearnable (reports/quality_ss_spec.json)."""
    from text2protein_tpu.data.synthetic import (
        _HELIX_PHI,
        helix_bundle_torsions,
    )

    L, nh = 96, 4

    def helix_mask(seed, vary):
        phi, _ = helix_bundle_torsions(L, seed=seed, n_helices=nh,
                                       jitter_deg=0.0, vary_placement=vary)
        assert len(phi) == L
        return np.isclose(phi, np.deg2rad(_HELIX_PHI), atol=1e-6)

    fixed = [helix_mask(s, False) for s in range(4)]
    varied = [helix_mask(s, True) for s in range(4)]
    # equal split: same placement for every seed
    for m in fixed[1:]:
        np.testing.assert_array_equal(fixed[0], m)
    # varied split: at least 3 of 4 seeds differ from the equal split
    n_diff = sum(not np.array_equal(v, fixed[0]) for v in varied)
    assert n_diff >= 3, n_diff
    # segments stay >= 5 residues: runs of consecutive helix flags
    for v in varied:
        runs = np.diff(np.flatnonzero(np.diff(
            np.concatenate([[0], v.astype(int), [0]]))).reshape(-1, 2),
            axis=1)
        assert (runs >= 5).all(), runs.T


def _import_reference_dataset():
    """Import the reference's dataset.py itself (biotite stubbed — the 6D
    math never touches it). This closes the self-written-oracle gap: the
    oracle below IS `/root/reference/dataset.py:396-450`."""
    import sys
    import types
    from pathlib import Path

    ref = "/root/reference"
    if not Path(ref, "dataset.py").exists():
        pytest.skip("reference tree not present")
    if ref not in sys.path:
        sys.path.insert(0, ref)
    for name in ("biotite", "biotite.structure", "biotite.structure.io",
                 "biotite.structure.io.pdb"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["biotite.structure.io.pdb"].PDBFile = object
    import dataset as ref_dataset

    return ref_dataset


@pytest.mark.parametrize("L,seed", [(24, 0), (48, 3), (64, 7)])
def test_matches_reference_get_coords6d_exactly(L, seed):
    """Run the reference's ACTUAL get_coords6d as the oracle on random-walk
    backbones and compare all four channels."""
    ref_dataset = _import_reference_dataset()
    rng = np.random.RandomState(seed)
    steps = rng.randn(L, 3)
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    for i in range(1, L):
        steps[i] = 0.7 * steps[i - 1] + 0.3 * steps[i]
        steps[i] /= np.linalg.norm(steps[i])
    ca = np.cumsum(3.8 * steps, axis=0)
    n = ca + np.array([0.9, -0.9, -0.5]) + rng.randn(L, 3) * 0.02
    c = ca + np.array([-0.7, 0.9, 0.7]) + rng.randn(L, 3) * 0.02
    xyz = np.stack([n, ca, c], axis=1)

    want = ref_dataset.get_coords6d(xyz.copy(), dmax=20.0, normalize=True)
    got = get_coords6d(xyz, dmax=20.0, normalize=True)
    np.testing.assert_allclose(
        np.nan_to_num(got), np.nan_to_num(want), atol=1e-10
    )
    got_jax = np.asarray(get_coords6d_jax(xyz.astype(np.float32)))
    np.testing.assert_allclose(
        np.nan_to_num(got_jax), np.nan_to_num(want), atol=2e-4
    )
