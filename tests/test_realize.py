"""Realization tier: NeRF builder geometry, restraint energies, and the
end-to-end 6D -> 3D recovery test (minimize a real structure's own maps and
check TM-score against the original backbone)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from text2protein_tpu.realize.geometry import (
    build_backbone,
    random_dihedrals,
    dihedral4,
    angle3,
    B_N_CA,
    B_CA_C,
    B_C_N,
    A_N_CA_C,
)
from text2protein_tpu.realize.restraints import (
    inverse_scale,
    restraints_from_maps,
    restraint_energy,
    clash_energy,
)


def test_backbone_bond_geometry():
    key = jax.random.PRNGKey(0)
    phi, psi, omega = random_dihedrals(key, 20)
    bb = np.asarray(build_backbone(phi, psi, omega))
    assert bb.shape == (20, 3, 3)
    # bond lengths
    n_ca = np.linalg.norm(bb[:, 1] - bb[:, 0], axis=-1)
    ca_c = np.linalg.norm(bb[:, 2] - bb[:, 1], axis=-1)
    c_n = np.linalg.norm(bb[1:, 0] - bb[:-1, 2], axis=-1)
    np.testing.assert_allclose(n_ca, B_N_CA, atol=1e-4)
    np.testing.assert_allclose(ca_c, B_CA_C, atol=1e-4)
    np.testing.assert_allclose(c_n, B_C_N, atol=1e-4)
    # CA-CA virtual bond ~3.8 A for trans peptides
    ca_ca = np.linalg.norm(bb[1:, 1] - bb[:-1, 1], axis=-1)
    assert np.all(ca_ca > 3.6) and np.all(ca_ca < 4.0)


def test_backbone_torsions_roundtrip():
    """Torsions measured on the built chain must equal the inputs."""
    key = jax.random.PRNGKey(1)
    phi, psi, omega = random_dihedrals(key, 12)
    bb = build_backbone(phi, psi, omega)
    n, ca, c = bb[:, 0], bb[:, 1], bb[:, 2]
    got_phi = np.asarray(dihedral4(c[:-1], n[1:], ca[1:], c[1:]))
    got_psi = np.asarray(dihedral4(n[:-1], ca[:-1], c[:-1], n[1:]))

    def wrap(x):
        return np.arctan2(np.sin(x), np.cos(x))

    np.testing.assert_allclose(
        wrap(got_phi - np.asarray(phi[1:])), 0, atol=1e-4
    )
    np.testing.assert_allclose(
        wrap(got_psi - np.asarray(psi[:-1])), 0, atol=1e-4
    )


def test_builder_is_differentiable():
    phi, psi, omega = random_dihedrals(jax.random.PRNGKey(2), 10)

    def loss(phi):
        bb = build_backbone(phi, psi, omega)
        return jnp.sum(bb**2)

    g = jax.grad(loss)(phi)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def _gt_maps(L=24, seed=0):
    """Ground-truth 6D maps of a synthetic backbone, in sampled-map format."""
    from text2protein_tpu.data.featurize import featurize_structure

    phi, psi, omega = random_dihedrals(jax.random.PRNGKey(seed), L)
    bb = np.asarray(build_backbone(phi, psi, omega))
    c6d, mask_pair, _ = featurize_structure(bb, np.ones(L), ss_constraints=False)
    return bb, c6d


def test_inverse_scale_roundtrip():
    bb, c6d = _gt_maps(16)
    L = 16
    npz = inverse_scale(c6d, L)
    # dist_abs must equal true Cb distances (clamped at 20)
    from text2protein_tpu.realize.geometry import virtual_cb_from_backbone

    cb = np.asarray(virtual_cb_from_backbone(jnp.asarray(bb)))
    d = np.linalg.norm(cb[:, None] - cb[None, :], axis=-1)
    d = np.minimum(d, 20.0)
    off_diag = ~np.eye(L, dtype=bool)
    np.testing.assert_allclose(
        npz["dist_abs"][off_diag], d[off_diag], atol=1e-2
    )


def test_gt_backbone_has_near_zero_restraint_energy():
    """A backbone evaluated against its own 6D maps must score ~0 restraint
    energy (up to the dist clamp at dmax)."""
    bb, c6d = _gt_maps(20, seed=3)
    npz = inverse_scale(c6d, 20)
    rst = restraints_from_maps(npz)
    e = float(
        restraint_energy(
            jnp.asarray(bb), rst, 1e9, {"dist": 1.0, "orient": 1.0}
        )
    )
    # random backbone for comparison
    phi2, psi2, om2 = random_dihedrals(jax.random.PRNGKey(99), 20)
    bb2 = build_backbone(phi2, psi2, om2)
    e2 = float(restraint_energy(bb2, rst, 1e9, {"dist": 1.0, "orient": 1.0}))
    assert e < 1e-2 * max(e2, 1.0), (e, e2)


def test_clash_energy():
    # straight chain: no clashes
    phi, psi, om = random_dihedrals(jax.random.PRNGKey(0), 10)
    bb = build_backbone(phi, psi, om)
    e = float(clash_energy(bb))
    # collapsed chain: all atoms at ~same point -> large clash
    bb_collapsed = jnp.zeros_like(bb)
    e_bad = float(clash_energy(bb_collapsed))
    assert e_bad > e


@pytest.mark.slow
def test_minimization_recovers_structure():
    """GT-map round-trip at L=64: minimizing a compact helix bundle's own
    maps must recover the backbone near-natively (TM > 0.8). Exercises the
    distance-geometry + Cartesian protocol incl. mirror disambiguation and
    the rama/omega/hbond/bonded terms. (The full 5-restart protocol reaches
    TM 0.98-1.0 on TPU — scripts/exp_realize.py; 3 restarts keeps CPU CI
    time bounded.)"""
    from text2protein_tpu.data.synthetic import helix_bundle_backbone
    from text2protein_tpu.data.featurize import featurize_structure
    from text2protein_tpu.realize.minimize import run_minimization
    from text2protein_tpu.eval.tmscore import tm_score

    L = 64
    bb_true = helix_bundle_backbone(L, seed=5)
    c6d, _, _ = featurize_structure(bb_true, np.ones(L), ss_constraints=False)
    npz = inverse_scale(c6d, L)
    bb_min, e_best, energies = run_minimization(
        npz, "A" * L, n_restarts=3, max_iter=150, seed=1
    )
    assert np.isfinite(bb_min).all()
    tm = tm_score(bb_min[:, 1], bb_true[:, 1])
    assert tm > 0.8, f"TM-score {tm} (energies {energies})"
    # delivered geometry is near-ideal (the idealization stage's contract)
    n_ca = np.linalg.norm(bb_min[:, 1] - bb_min[:, 0], axis=-1)
    c_n = np.linalg.norm(bb_min[1:, 0] - bb_min[:-1, 2], axis=-1)
    assert np.abs(n_ca - B_N_CA).max() < 0.1, np.abs(n_ca - B_N_CA).max()
    assert np.abs(c_n - B_C_N).max() < 0.1, np.abs(c_n - B_C_N).max()


def test_rama_energy_prefers_allowed_basins():
    """Helix torsions must score far better than disallowed (phi > 0,
    psi ~ -120) regions; energy is finite and differentiable."""
    from text2protein_tpu.realize.restraints import rama_energy

    L = 16
    helix = (jnp.full((L,), jnp.deg2rad(-61.0)),
             jnp.full((L,), jnp.deg2rad(-41.0)))
    bad = (jnp.full((L,), jnp.deg2rad(120.0)),
           jnp.full((L,), jnp.deg2rad(-120.0)))
    e_helix = float(rama_energy(*helix))
    e_bad = float(rama_energy(*bad))
    assert e_helix < e_bad - 1.0, (e_helix, e_bad)
    g = jax.grad(lambda p: rama_energy(p, helix[1]))(helix[0])
    assert np.isfinite(np.asarray(g)).all()


def test_bonded_energy_zero_on_ideal_chain():
    """A NeRF-built chain has exactly ideal covalent geometry and trans
    omegas -> bonded energy ~ 0; perturbed coordinates score high."""
    from text2protein_tpu.realize.restraints import bonded_energy

    phi, psi, om = random_dihedrals(jax.random.PRNGKey(4), 12)
    bb = build_backbone(phi, psi, om)
    e = float(bonded_energy(bb))
    e_pert = float(bonded_energy(bb + 0.05 * jax.random.normal(
        jax.random.PRNGKey(5), bb.shape)))
    assert e < 1e-2 * e_pert, (e, e_pert)


def test_hbond_energy_favors_helix():
    """An alpha helix forms i->i+4 backbone H-bonds; an extended chain forms
    none -> helix hbond energy must be substantially lower (more negative)."""
    from text2protein_tpu.realize.restraints import hbond_energy

    L = 16
    helix = build_backbone(jnp.full((L,), jnp.deg2rad(-61.0)),
                           jnp.full((L,), jnp.deg2rad(-41.0)))
    ext = build_backbone(jnp.full((L,), jnp.deg2rad(-135.0)),
                         jnp.full((L,), jnp.deg2rad(135.0)))
    e_helix = float(hbond_energy(helix))
    e_ext = float(hbond_energy(ext))
    assert e_helix < e_ext - 2.0, (e_helix, e_ext)
    assert e_helix < 0


def test_dist_geometry_init_recovers_topology():
    """MDS on a GT distance map must recover the CA trace topology in one of
    the two mirror images (TM > 0.5 for the better hand)."""
    from text2protein_tpu.data.synthetic import helix_bundle_backbone
    from text2protein_tpu.data.featurize import featurize_structure
    from text2protein_tpu.realize.minimize import dist_geometry_init
    from text2protein_tpu.eval.tmscore import tm_score

    L = 48
    bb = helix_bundle_backbone(L, seed=2)
    c6d, _, _ = featurize_structure(bb, np.ones(L), ss_constraints=False)
    npz = inverse_scale(c6d, L)
    ca = dist_geometry_init(npz["dist_abs"])
    tm = max(
        tm_score(ca, bb[:, 1]),
        tm_score(ca * np.array([1, 1, -1.0], np.float32), bb[:, 1]),
    )
    assert tm > 0.5, tm


def test_relax_backbone_preserves_structure():
    """The relax round (CA coordinate restraints) must not drift far from its
    input pose and must not increase the total restraint energy much."""
    from text2protein_tpu.realize.minimize import relax_backbone
    from text2protein_tpu.realize.restraints import restraints_from_maps
    from text2protein_tpu.eval.tmscore import tm_score

    L = 20
    bb_true, c6d = _gt_maps(L, seed=7)
    npz = inverse_scale(c6d, L)
    rst = restraints_from_maps(npz)
    bb_rel, e_rel = relax_backbone(jnp.asarray(bb_true), rst, max_iter=30)
    bb_rel = np.asarray(bb_rel)
    assert np.isfinite(bb_rel).all()
    tm = tm_score(bb_rel[:, 1], bb_true[:, 1])
    assert tm > 0.8, tm


def test_torsion_measurement_roundtrip():
    from text2protein_tpu.realize.minimize import _torsions_from_backbone

    phi, psi, om = random_dihedrals(jax.random.PRNGKey(3), 14)
    bb = build_backbone(phi, psi, om)
    phi2, psi2, om2 = _torsions_from_backbone(bb)
    bb2 = build_backbone(phi2, psi2, om2)
    # rebuilt chain is rigid-identical (same frame by construction)
    np.testing.assert_allclose(np.asarray(bb2), np.asarray(bb), atol=1e-3)


def test_motif_scaffolding_fixes_region():
    """With a pose and design mask, non-design torsions must stay at the
    input pose values (bit-near), while masked spans get rebuilt."""
    from text2protein_tpu.realize.minimize import (
        run_minimization, _torsions_from_backbone,
    )

    L = 20
    bb_true, c6d = _gt_maps(L, seed=11)
    npz = inverse_scale(c6d, L)
    # mask residues 8..12 for redesign
    seq = "A" * 8 + "_" * 5 + "A" * 7
    bb_out, e, _ = run_minimization(
        npz, seq, n_restarts=2, max_iter=40, seed=0,
        use_fastrelax=False, pose_bb=bb_true,
    )
    phi_t, psi_t, _ = _torsions_from_backbone(jnp.asarray(bb_true))
    phi_o, psi_o, _ = _torsions_from_backbone(jnp.asarray(bb_out))

    def wrap(x):
        return np.arctan2(np.sin(x), np.cos(x))

    fixed = np.array([c != "_" for c in seq])
    # fixed-region torsions preserved (phi[0]/psi[-1] are parameterization
    # extras; compare interior)
    dphi = np.abs(wrap(np.asarray(phi_o - phi_t)))[1:][fixed[1:]]
    dpsi = np.abs(wrap(np.asarray(psi_o - psi_t)))[:-1][fixed[:-1]]
    assert dphi.max() < 1e-3, dphi.max()
    assert dpsi.max() < 1e-3, dpsi.max()


def test_realize_batch():
    """Batched (vmapped-designs) realization matches per-design quality."""
    from text2protein_tpu.realize.minimize import realize_batch
    from text2protein_tpu.eval.tmscore import tm_score

    L = 24
    trues, samples = [], []
    for seed in (21, 22):
        bb, c6d = _gt_maps(L, seed=seed)
        trues.append(bb)
        samples.append(c6d)
    bbs, energies = realize_batch(np.stack(samples), n_restarts=3, max_iter=60)
    assert bbs.shape == (2, L, 3, 3)
    assert np.isfinite(bbs).all() and np.isfinite(energies).all()
    for bb_min, bb_true in zip(bbs, trues):
        assert tm_score(bb_min[:, 1], bb_true[:, 1]) > 0.4


def test_realize_batch_managed_retries_and_flags():
    """Tail management (VERDICT r2 #7): outlier-energy designs are retried
    with fresh restart seeds and flagged when still high-energy."""
    from text2protein_tpu.realize.minimize import realize_batch_managed

    L = 24
    samples = []
    for seed in (31, 32, 33, 34):
        _, c6d = _gt_maps(L, seed=seed)
        samples.append(c6d)
    # corrupt one map's geometry channels with noise so its restraints are
    # inconsistent -> high selection energy survives retries -> flagged
    rng = np.random.RandomState(0)
    samples[3] = samples[3].copy()
    samples[3][:4] = np.clip(
        samples[3][:4] + rng.randn(*samples[3][:4].shape) * 0.8, -1, 1
    )
    bbs, energies, flags = realize_batch_managed(
        np.stack(samples), n_restarts=2, max_iter=40, max_retries=1
    )
    assert bbs.shape == (4, L, 3, 3)
    assert np.isfinite(energies).all()
    assert flags.dtype == bool and flags.shape == (4,)
    assert flags[3] and not flags[:3].any()


def test_realize_batch_managed_keep_best_writes_readonly(monkeypatch):
    """Regression: realize_batch returns np.asarray views of jax arrays,
    which are READ-ONLY; the keep-best retry write must copy first
    (crashed the r3 SS eval with 'assignment destination is read-only')."""
    import text2protein_tpu.realize.minimize as M

    L, D = 8, 3
    calls = {"n": 0}

    def fake_realize_batch(samples_cnn, **kwargs):
        calls["n"] += 1
        bbs = np.zeros((D, L, 3, 3), dtype=np.float32)
        bbs += calls["n"]
        # first call: design 2 is a 10x-median outlier; retry halves it
        es = np.array([1.0, 1.0, 10.0 / calls["n"]], dtype=np.float32)
        bbs.setflags(write=False)
        es.setflags(write=False)
        return bbs, es

    monkeypatch.setattr(M, "realize_batch", fake_realize_batch)
    bbs, energies, flags = M.realize_batch_managed(
        np.zeros((D, 5, L, L), dtype=np.float32), max_retries=1
    )
    assert calls["n"] == 2
    # design 2's retry result (value 2.0 backbone, energy 5.0) was kept
    assert energies[2] == 5.0 and (bbs[2] == 2.0).all()
    assert energies[0] == 1.0 and (bbs[0] == 1.0).all()
