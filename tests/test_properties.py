"""Property-based tests (hypothesis) for the pure-math seams.

The reference validates these components only by eyeball (SURVEY.md §4);
the unit suite pins them to golden values. This module adds the invariants
that must hold for *any* input:

- 6D featurization is rigid-motion invariant (dist/omega/theta/phi are
  internal coordinates — `/root/reference/dataset.py:396-450` computes them
  from pairwise geometry only) and dist/omega are pair-symmetric.
- PDB write -> read round-trips backbone coordinates at the format's
  precision (3 decimals) for arbitrary sequences/chains.
- TM-score of a structure against a rigid copy of itself is 1.0 — the
  Kabsch + alignment stack must find the identity alignment.
- selected_mask_batch parses any valid span spec into the reference's
  pair-mask semantics (`/root/reference/utils.py:62-81`).

All properties run on host numpy (no XLA compiles inside hypothesis loops;
the 1-core CI host makes per-example jit unaffordable).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

# Deterministic example generation: example choice must not vary between
# CI runs (a fresh machine every round has no hypothesis example database).
settings.register_profile("ci", derandomize=True)
settings.load_profile("ci")

from text2protein_tpu.data.featurize import get_coords6d, virtual_cb
from text2protein_tpu.data.pdbio import read_pdb, write_backbone_pdb
from text2protein_tpu.data.vocab import THREE_TO_ONE
from text2protein_tpu.eval.tmscore import tm_score

AA20 = "ACDEFGHIKLMNPQRSTVWY"


def _random_rotation(u: np.ndarray) -> np.ndarray:
    """Unit quaternion (from 4 floats) -> rotation matrix."""
    q = np.asarray(u, dtype=np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _plausible_backbone(seed: int, L: int) -> np.ndarray:
    """(L, 3, 3) N/CA/C coords with protein-like bond geometry: a noisy
    extended chain — non-degenerate (no coincident atoms), unclamped dists."""
    rng = np.random.RandomState(seed)
    ca = np.cumsum(rng.normal([3.8, 0, 0], 0.3, size=(L, 3)), axis=0)
    ca += rng.normal(0, 1.0, size=(L, 3))
    n = ca + rng.normal([-1.0, 0.6, 0], 0.05, size=(L, 3))
    c = ca + rng.normal([1.0, 0.6, 0], 0.05, size=(L, 3))
    return np.stack([n, ca, c], axis=1)


quat = st.tuples(*[st.floats(-1, 1, allow_nan=False) for _ in range(4)]).filter(
    lambda q: np.linalg.norm(q) > 1e-3
)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), L=st.integers(4, 24), q=quat,
       t=st.tuples(*[st.floats(-50, 50, allow_nan=False) for _ in range(3)]))
def test_coords6d_rigid_motion_invariant(seed, L, q, t):
    bb = _plausible_backbone(seed, L)
    R = _random_rotation(q)
    bb2 = bb @ R.T + np.asarray(t)
    f1 = get_coords6d(bb)
    f2 = get_coords6d(bb2)
    np.testing.assert_allclose(f1, f2, atol=1e-6, equal_nan=True)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), L=st.integers(4, 24))
def test_coords6d_symmetry(seed, L):
    """dist(i,j)=dist(j,i); omega (CA-CB-CB-CA dihedral) is pair-symmetric;
    the diagonal carries no self-contact (i==j is excluded from the contact
    set like the reference's `if i != j`, so dist stays at dmax -> +1)."""
    f = get_coords6d(_plausible_backbone(seed, L))
    dist, omega = f[..., 0], f[..., 1]
    np.testing.assert_allclose(dist, dist.T, atol=1e-9)
    np.testing.assert_allclose(omega, omega.T, atol=1e-6, equal_nan=True)
    np.testing.assert_allclose(np.diag(dist), 1.0, atol=1e-9)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), L=st.integers(4, 24))
def test_virtual_cb_chirality(seed, L):
    """Reflecting the backbone must move the virtual Cb relative to the
    frame: Cb sits out of the N-CA-C plane with a fixed handedness, so a
    mirror image gets a different Cb-to-plane offset sign."""
    bb = _plausible_backbone(seed, L)
    cb = virtual_cb(bb)
    mirror = bb * np.array([1.0, 1.0, -1.0])
    cb_m = virtual_cb(mirror)
    n, ca, c = bb[:, 0], bb[:, 1], bb[:, 2]
    normal = np.cross(n - ca, c - ca)
    norm = np.linalg.norm(normal, axis=-1)
    assume_mask = norm > 1e-6
    s1 = np.einsum("ij,ij->i", cb - ca, normal)
    s2 = np.einsum("ij,ij->i", (cb_m - ca * [1, 1, -1]) * [1, 1, -1], normal)
    # the offset magnitude is preserved, the sign flips
    np.testing.assert_allclose(np.abs(s1[assume_mask]), np.abs(s2[assume_mask]),
                               rtol=1e-6)
    assert (np.sign(s1[assume_mask]) == -np.sign(s2[assume_mask])).all()


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), L=st.integers(2, 30),
       chain=st.sampled_from("ABXZ"))
def test_pdb_roundtrip(tmp_path_factory, seed, L, chain):
    rng = np.random.RandomState(seed)
    coords = np.round(rng.uniform(-999, 999, size=(L, 3, 3)), 3)
    seq = "".join(rng.choice(list(AA20), size=L))
    path = tmp_path_factory.mktemp("pdb") / "x.pdb"
    write_backbone_pdb(path, coords, seq=seq, chain=chain)
    s = read_pdb(path)
    res = s.amino_residues()
    assert len(res) == L
    assert "".join(THREE_TO_ONE[r.name] for r in res) == seq
    assert all(r.chain == chain for r in res)
    got = np.stack([np.stack([r.atom(a) for a in ("N", "CA", "C")]) for r in res])
    np.testing.assert_allclose(got, coords, atol=5e-4)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), L=st.integers(8, 28), q=quat,
       t=st.tuples(*[st.floats(-30, 30, allow_nan=False) for _ in range(3)]))
def test_tm_score_rigid_self_identity(seed, L, q, t):
    ca = _plausible_backbone(seed, L)[:, 1]
    moved = ca @ _random_rotation(q).T + np.asarray(t)
    assert tm_score(ca, moved) > 0.999


span = st.tuples(st.integers(0, 30), st.integers(0, 8)).map(
    lambda se: (se[0], se[0] + se[1])
)


@settings(max_examples=25, deadline=None)
@given(spans=st.lists(span, min_size=1, max_size=4),
       b=st.integers(1, 3))
def test_selected_mask_batch_semantics(spans, b):
    from text2protein_tpu.conditioning import selected_mask_batch

    n = 48
    spec = ",".join(f"{s}:{e}" for s, e in spans)
    m = np.asarray(selected_mask_batch(spec, b, n))
    assert m.shape == (b, n, n) and m.dtype == bool
    resmask = np.zeros(n, bool)
    for s, e in spans:
        resmask[s : e + 1] = True
    expect = resmask[:, None] | resmask[None, :]
    for i in range(b):
        np.testing.assert_array_equal(m[i], expect)
