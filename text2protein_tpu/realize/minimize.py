"""Restrained minimization: 6D maps -> 3D backbone.

The capability of `/root/reference/rosetta_min/run.py:9-151` (PyRosetta
MinMover protocol), re-designed TPU-native. Two cooperating protocols:

1. **Distance-geometry + Cartesian (default, new).** The reference explores
   5 random Ramachandran restarts because torsion-space minimization from a
   random coil is highly non-convex. Here the fold's global topology is
   solved directly: shortest-path-completed classical MDS on the sampled
   distance map gives a CA trace up to mirror symmetry; both mirrors (plus
   random-init backups) are minimized in CARTESIAN space — restraints +
   clash + covalent-geometry (cart_bonded role) + Ramachandran prior +
   backbone H-bond well — then idealized with a tightened bonded term. The
   chirality-sensitive theta/omega orientation restraints select the correct
   mirror by energy. All restarts run as one vmapped batch on device.

2. **Torsion-space staged protocol (reference-faithful; motif scaffolding).**
   The reference schedule — Ramachandran random init, staged
   short(3-12)/medium(12-24)/long(24-L) sequence-separation restraint
   addition, L-BFGS, weight ladders over restarts (`run.py:5-7,90-95`) —
   as a pure-JAX program, now including the rama prior. Used when input
   torsions must be clamped (motif scaffolding, `run.py:68-87`).

Energy terms follow `/root/reference/rosetta_min/data/scorefxn*.wts`:
cen_hb 5.0 (hbond_energy), rama 1.0, omega 0.5 (inside bonded_energy),
vdw ladder (clash_energy), atom_pair/dihedral/angle constraint ladders
(restraint_energy).
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .geometry import build_backbone, random_dihedrals, dihedral4
from .restraints import (
    Restraints,
    restraints_from_maps,
    restraint_energy,
    clash_energy,
    bonded_energy,
    rama_energy,
    rama_energy_cartesian,
    hbond_energy,
    long_dist_energy,
    ca_coordinate_energy,
    inverse_scale,
)

# Weight ladders (`/root/reference/rosetta_min/run.py:5-7`): key = run index,
# default for later runs = last value.
VDW_WEIGHT = {0: 3.0, 1: 5.0, 2: 10.0}
RSR_DIST_WEIGHT = {0: 3.0, 1: 2.0, 3: 1.0}
RSR_ORIENT_WEIGHT = {0: 1.0, 1: 1.0, 3: 0.5}

STAGES = (12.0, 24.0, 1e9)  # short / medium / long seq-sep uppers (cumulative)

# scorefxn.wts term weights (rama 1.0, cen_hb 5.0; omega 0.5 is inside
# bonded_energy's omega_std scaling)
W_RAMA = 1.0
W_HBOND = 5.0


def _lbfgs_minimize(energy_fn, x0, max_iter=150):
    """L-BFGS with zoom linesearch (optax), fixed-iteration scan, returning
    the BEST-so-far iterate (optax lbfgs can diverge when iterated past
    convergence; tracking the running argmin makes the solve monotone)."""
    solver = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(energy_fn)

    def step(carry, _):
        x, state, x_best, f_best = carry
        value, grad = value_and_grad(x, state=state)
        better = value < f_best
        x_best = jax.tree.map(
            lambda b, c: jnp.where(better, c, b), x_best, x
        )
        f_best = jnp.where(better, value, f_best)
        updates, state = solver.update(
            grad, state, x, value=value, grad=grad, value_fn=energy_fn
        )
        x = optax.apply_updates(x, updates)
        return (x, state, x_best, f_best), None

    state0 = solver.init(x0)
    (x, _, x_best, f_best), _ = jax.lax.scan(
        step, (x0, state0, x0, jnp.inf), None, length=max_iter
    )
    f_last = energy_fn(x)
    return jax.tree.map(
        lambda b, c: jnp.where(f_last < f_best, c, b), x_best, x
    )


# --------------------------------------------------------------------------
# Distance-geometry initialization
# --------------------------------------------------------------------------


def dist_geometry_init(dist_abs: np.ndarray, missing_cutoff: float = 19.5):
    """CA trace from a (L, L) absolute distance map via shortest-path-
    completed classical MDS.

    Entries at the featurizer clamp (dmax=20) carry no information and are
    treated as missing; missing distances are filled with graph shortest
    paths (scipy C-implemented Dijkstra over known edges incl. the 3.8 A
    chain bond — the former numpy Floyd-Warshall loop was O(L^3) Python/
    BLAS per design and dominated N=256 batch realization on this 1-core
    host, VERDICT r2 weak #6), then classical MDS (double-centered Gram
    eigendecomposition) embeds in 3-D. The result is defined up to
    reflection — callers must consider both mirrors (the theta/omega
    orientation restraints are chirality-sensitive and select the true hand
    by energy).
    """
    from scipy.sparse.csgraph import shortest_path

    D = np.asarray(dist_abs, np.float64).copy()
    L = D.shape[0]
    np.fill_diagonal(D, 0.0)
    missing = D >= missing_cutoff
    for i in range(L - 1):
        D[i, i + 1] = D[i + 1, i] = min(D[i, i + 1], 3.8)
        missing[i, i + 1] = missing[i + 1, i] = False
    # dense-graph semantics: 0 means NO edge — clamp genuine near-zero
    # distances (raw samples do contain d=0 at the clip boundary) to a
    # positive floor so they stay edges
    Dc = shortest_path(
        np.where(missing, 0.0, np.maximum(D, 1e-3)), method="D",
        directed=False,
    )
    J = np.eye(L) - 1.0 / L
    B = -0.5 * J @ (Dc**2) @ J
    w, V = np.linalg.eigh(B)
    X = V[:, -3:] * np.sqrt(np.maximum(w[-3:], 0.0))
    return X.astype(np.float32)


def ca_trace_to_backbone(ca: np.ndarray) -> np.ndarray:
    """Deterministic N/CA/C backbone from a CA trace: N toward the previous
    CA and C toward the next, tilted out of the local bisector plane (a
    crude-but-consistent frame; Cartesian minimization immediately fixes the
    covalent geometry)."""
    ca = np.asarray(ca, np.float64)
    prev = np.vstack([2 * ca[0] - ca[1], ca[:-1]])
    nxt = np.vstack([ca[1:], 2 * ca[-1] - ca[-2]])
    u = prev - ca
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
    v = nxt - ca
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    na = np.cross(u, v)
    na /= np.linalg.norm(na, axis=1, keepdims=True) + 1e-9
    bis = u + v
    bis /= np.linalg.norm(bis, axis=1, keepdims=True) + 1e-9
    nd = 0.5 * u + 0.5 * bis + 0.3 * na
    nd /= np.linalg.norm(nd, axis=1, keepdims=True) + 1e-9
    cd = 0.5 * v + 0.5 * bis - 0.3 * na
    cd /= np.linalg.norm(cd, axis=1, keepdims=True) + 1e-9
    return np.stack(
        [ca + 1.46 * nd, ca, ca + 1.52 * cd], axis=1
    ).astype(np.float32)


# --------------------------------------------------------------------------
# Cartesian protocol
# --------------------------------------------------------------------------


def _cartesian_refine(bb0, rst: Restraints, max_iter: int):
    """Two-stage Cartesian minimization of one starting backbone:
    restraint-dominated fold stage, then geometry-tightened idealization.
    Returns (bb, selection_energy)."""

    def e_fold(bb):
        return (
            restraint_energy(bb, rst, 1e9, {"dist": 3.0, "orient": 1.0})
            + 3.0 * clash_energy(bb)
            + 0.2 * bonded_energy(bb)
            + W_RAMA * rama_energy_cartesian(bb)
            + W_HBOND * hbond_energy(bb)
            + 1.0 * long_dist_energy(bb, rst)
        )

    def e_ideal(bb):
        return (
            restraint_energy(bb, rst, 1e9, {"dist": 1.0, "orient": 0.5})
            + 3.0 * clash_energy(bb)
            + 2.0 * bonded_energy(bb, len_std=0.01, ang_std=0.017,
                                  omega_std=0.05)
            + W_RAMA * rama_energy_cartesian(bb)
            + W_HBOND * hbond_energy(bb)
            + 0.5 * long_dist_energy(bb, rst)
        )

    bb = _lbfgs_minimize(e_fold, bb0, max_iter)
    bb = _lbfgs_minimize(e_ideal, bb, max(max_iter * 2 // 3, 50))
    e_sel = restraint_energy(
        bb, rst, 1e9, {"dist": 1.0, "orient": 1.0}
    ) + clash_energy(bb)
    return bb, e_sel


def _restart_starts(dist_abs: np.ndarray, L: int, n_restarts: int,
                    seed: int) -> np.ndarray:
    """(R, L, 3, 3) restart backbones: [MDS trace, its mirror] + the MDS
    trace perturbed (+-2 A Gaussian on the CAs) in alternating hands — far
    better-converging than random coils, still diverse. Shared by the
    single-design and batched realization paths."""
    ca = dist_geometry_init(dist_abs)
    mirror = ca * np.array([1.0, 1.0, -1.0], np.float32)
    starts = [ca_trace_to_backbone(ca), ca_trace_to_backbone(mirror)]
    rng = np.random.RandomState(seed)
    for k in range(max(n_restarts - 2, 0)):
        base = ca if k % 2 else mirror
        starts.append(
            ca_trace_to_backbone(
                base + rng.randn(L, 3).astype(np.float32) * 2.0
            )
        )
    return np.stack(starts)


def minimize_cartesian(key, rst: Restraints, dist_abs: np.ndarray, L: int,
                       n_restarts: int = 5, max_iter: int = 300):
    """Distance-geometry + Cartesian protocol (see module docstring).

    Restarts = [MDS, MDS-mirror] + (n_restarts - 2) random Ramachandran
    chains, minimized as one vmapped batch; lowest selection energy wins.
    Returns (bb (L, 3, 3), best_energy, all_energies).
    """
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    bb0 = jnp.asarray(_restart_starts(dist_abs, L, n_restarts, seed))

    @functools.partial(jax.jit, static_argnames=("max_iter",))
    def run(bb0, rst, max_iter):
        return jax.vmap(
            lambda b: _cartesian_refine(b, rst, max_iter)
        )(bb0)

    bbs, energies = run(bb0, rst, max_iter)
    best = jnp.argmin(energies)
    return bbs[best], energies[best], energies


# --------------------------------------------------------------------------
# Torsion-space staged protocol (reference-faithful; motif scaffolding)
# --------------------------------------------------------------------------


def minimize_torsions(key, rst: Restraints, L: int, n_restarts: int = 5,
                      max_iter: int = 150, fixed_torsions=None,
                      design_mask=None):
    """Run the full staged multi-restart torsion protocol; returns the best
    backbone. All restarts execute as one vmapped batch on device.

    Motif scaffolding (`/root/reference/rosetta_min/run.py:68-87`): with
    `fixed_torsions` ((2, L) phi/psi) and `design_mask` ((L,) bool, True =
    redesign), non-design torsions are clamped to the input pose and only the
    masked spans are optimized (the MoveMap restriction's role).
    """
    if design_mask is None:
        design_mask = jnp.ones((L,), bool)
    design2 = jnp.broadcast_to(design_mask[None, :], (2, L))

    def clamp(x):
        if fixed_torsions is None:
            return x
        return jnp.where(design2, x, fixed_torsions)

    def single_run(run_idx, key):
        phi, psi, omega = random_dihedrals(key, L)
        # perturbation on restarts (run.py:110-123): +/- 10 degrees
        k1, k2 = jax.random.split(key)
        jitter = jnp.where(run_idx > 0, 1.0, 0.0)
        phi = phi + jitter * jax.random.uniform(
            k1, (L,), minval=-jnp.deg2rad(10.0), maxval=jnp.deg2rad(10.0)
        )
        psi = psi + jitter * jax.random.uniform(
            k2, (L,), minval=-jnp.deg2rad(10.0), maxval=jnp.deg2rad(10.0)
        )
        x = clamp(jnp.stack([phi, psi], axis=0))  # (2, L)

        w_vdw = jnp.asarray(
            [VDW_WEIGHT.get(r, 10.0) for r in range(n_restarts)]
        )[run_idx]
        w_dist = jnp.asarray(
            [RSR_DIST_WEIGHT.get(r, 1.0) for r in range(n_restarts)]
        )[run_idx]
        w_orient = jnp.asarray(
            [RSR_ORIENT_WEIGHT.get(r, 0.5) for r in range(n_restarts)]
        )[run_idx]

        def energy(x, sep_max):
            xc = clamp(x)
            bb = build_backbone(xc[0], xc[1])
            e = restraint_energy(
                bb, rst, sep_max, {"dist": w_dist, "orient": w_orient}
            )
            e = e + W_RAMA * rama_energy(xc[0], xc[1])
            e = e + W_HBOND * hbond_energy(bb)
            return e + w_vdw * clash_energy(bb)

        # staged schedule: short -> +medium -> +long (cumulative bands)
        for sep_max in STAGES:
            x = _lbfgs_minimize(
                functools.partial(energy, sep_max=sep_max), x, max_iter
            )

        x = clamp(x)
        bb = build_backbone(x[0], x[1])
        # final scoring at unit weights over all bands (the cart-score role)
        e_final = restraint_energy(
            bb, rst, 1e9, {"dist": 1.0, "orient": 1.0}
        ) + clash_energy(bb)
        return bb, e_final

    keys = jax.random.split(key, n_restarts)
    run_ids = jnp.arange(n_restarts)
    bbs, energies = jax.vmap(single_run)(run_ids, keys)
    best = jnp.argmin(energies)
    return bbs[best], energies[best], energies


@functools.partial(jax.jit, static_argnames=("L", "n_restarts", "max_iter"))
def _minimize_jit(key, rst, L, n_restarts, max_iter, fixed_torsions=None,
                  design_mask=None):
    return minimize_torsions(key, rst, L, n_restarts, max_iter,
                             fixed_torsions=fixed_torsions,
                             design_mask=design_mask)


def _torsions_from_backbone(bb):
    """Measure (phi, psi, omega) from backbone coords (inverse of
    build_backbone; first phi / last psi default to the canonical values)."""
    n, ca, c = bb[:, 0], bb[:, 1], bb[:, 2]
    phi = jnp.concatenate(
        [jnp.array([-jnp.pi / 3]), dihedral4(c[:-1], n[1:], ca[1:], c[1:])]
    )
    psi = jnp.concatenate(
        [dihedral4(n[:-1], ca[:-1], c[:-1], n[1:]), jnp.array([jnp.pi / 3])]
    )
    omega = jnp.concatenate(
        [jnp.array([jnp.pi]), dihedral4(ca[:-1], c[:-1], n[1:], ca[1:])]
    )
    return phi, psi, omega


@functools.partial(jax.jit, static_argnames=("max_iter",))
def relax_backbone(bb0, rst: Restraints, max_iter: int = 100,
                   crd_std: float = 1.0, crd_tol: float = 1.0):
    """Relax stage (FastRelax-equivalent final polish,
    `/root/reference/rosetta_min/run.py:180-232`): re-minimize all restraints
    at unit weights PLUS flat-harmonic CA coordinate restraints anchored to
    the input pose, in Cartesian space with the full centroid term set."""
    ca_ref = bb0[:, 1]

    def energy(bb):
        e = restraint_energy(bb, rst, 1e9, {"dist": 1.0, "orient": 1.0})
        e = e + clash_energy(bb)
        e = e + 2.0 * bonded_energy(bb, len_std=0.01, ang_std=0.017,
                                    omega_std=0.05)
        e = e + W_RAMA * rama_energy_cartesian(bb)
        e = e + W_HBOND * hbond_energy(bb)
        e = e + 0.5 * long_dist_energy(bb, rst)
        return e + ca_coordinate_energy(bb, ca_ref, std=crd_std, tol=crd_tol)

    bb = _lbfgs_minimize(energy, bb0, max_iter)
    return bb, energy(bb)


def run_minimization(
    npz: dict,
    seq: str,
    outPath=None,
    seed: int = 0,
    n_restarts: int = 5,
    angle_std: float = 10.0,
    dist_std: float = 2.0,
    max_iter: int = 150,
    use_fastrelax: bool = True,
    pose_bb=None,
    method: str = "cartesian",
):
    """API mirror of `/root/reference/rosetta_min/run.py:9-19`: absolute-unit
    restraint maps + sequence -> minimized backbone written as PDB. With
    `use_fastrelax`, a final CA-coordinate-restrained relax round runs on the
    best pose (run.py:180-232's role).

    `method`: "cartesian" (default; distance-geometry init + Cartesian
    refinement) or "torsion" (reference-faithful staged torsion protocol).
    Motif scaffolding (`pose_bb` + '_'-masked `seq`) always uses the torsion
    protocol, which can clamp fixed torsions exactly.

    Returns (backbone (L, 3, 3) np.ndarray, best_energy, all_energies).
    """
    L = len(seq)
    rst = restraints_from_maps(npz, dist_std=dist_std, angle_std=angle_std)
    key = jax.random.PRNGKey(seed)
    if pose_bb is not None or method == "torsion":
        fixed_torsions = None
        design_mask = None
        if pose_bb is not None:
            phi0, psi0, _ = _torsions_from_backbone(jnp.asarray(pose_bb))
            fixed_torsions = jnp.stack([phi0, psi0], axis=0)
            design_mask = jnp.asarray([c == "_" for c in seq])
        bb, e_best, energies = _minimize_jit(
            key, rst, L, n_restarts, max_iter,
            fixed_torsions=fixed_torsions, design_mask=design_mask,
        )
    else:
        bb, e_best, energies = minimize_cartesian(
            key, rst, npz["dist_abs"], L,
            n_restarts=n_restarts, max_iter=max(max_iter * 2, 200),
        )

    if outPath is not None:
        from ..data.pdbio import write_backbone_pdb

        outPath = Path(outPath)
        outPath.mkdir(parents=True, exist_ok=True)
        write_backbone_pdb(
            outPath / "structure_before_design.pdb", np.asarray(bb), seq=seq
        )

    if use_fastrelax:
        bb_rel, e_rel = relax_backbone(jnp.asarray(bb), rst, max_iter=max_iter)
        e_rel_sel = float(
            restraint_energy(bb_rel, rst, 1e9, {"dist": 1.0, "orient": 1.0})
            + clash_energy(bb_rel)
        )
        if e_rel_sel < float(e_best):
            bb, e_best = bb_rel, e_rel_sel
        if outPath is not None:
            write_backbone_pdb(
                outPath / "final_structure.pdb", np.asarray(bb), seq=seq
            )

    return np.asarray(bb), float(e_best), np.asarray(energies)


def realize_batch(samples_cnn, n_restarts: int = 5, max_iter: int = 300,
                  seed: int = 0, angle_std: float = 10.0, dist_std: float = 2.0):
    """Batched realization: D same-length designs minimized concurrently on
    device — restarts AND designs vmapped (the reference runs one PyRosetta
    design at a time on CPU). Uses the Cartesian protocol with
    distance-geometry initialization.

    Args:
      samples_cnn: (D, C, N, N) sampled maps, all with the same real length.
    Returns:
      (backbones (D, L, 3, 3), best energies (D,)).
    """
    samples_cnn = np.asarray(samples_cnn)
    msk0 = np.round(samples_cnn[0, -1])
    L = int(round(np.sqrt((msk0 == 1).sum())))
    rsts, starts = [], []
    for s in samples_cnn:
        npz = inverse_scale(s, L)
        rsts.append(restraints_from_maps(npz, dist_std=dist_std,
                                         angle_std=angle_std))
        starts.append(
            _restart_starts(npz["dist_abs"], L, n_restarts,
                            seed + 31 * len(starts))
        )
    rst_batched = jax.tree.map(lambda *xs: jnp.stack(xs), *rsts)
    bb0 = jnp.asarray(np.stack(starts))  # (D, R, L, 3, 3)

    @functools.partial(jax.jit, static_argnames=("max_iter",))
    def run(bb0, rst, max_iter):
        def one_design(b0, r):
            bbs, es = jax.vmap(
                lambda b: _cartesian_refine(b, r, max_iter)
            )(b0)
            i = jnp.argmin(es)
            return bbs[i], es[i]

        return jax.vmap(one_design)(bb0, rst)

    bbs, energies = run(bb0, rst_batched, max_iter)
    return np.asarray(bbs), np.asarray(energies)


def realize_batch_managed(samples_cnn, n_restarts: int = 5,
                          max_iter: int = 300, seed: int = 0,
                          retry_factor: float = 3.0, max_retries: int = 2,
                          **kwargs):
    """`realize_batch` + tail management (VERDICT r2 weak #3): designs whose
    selection energy exceeds `retry_factor` x the batch median are
    re-realized with fresh restart seeds (same compiled shapes — a retry
    reuses the jitted program, no recompile over the tunnel), keeping the
    best outcome per design. Designs still above the threshold after
    `max_retries` are flagged.

    Returns (backbones (D, L, 3, 3), energies (D,), flags (D,) bool —
    True = realization still high-energy after retries).
    """
    samples_cnn = np.asarray(samples_cnn)
    bbs, energies = realize_batch(samples_cnn, n_restarts=n_restarts,
                                  max_iter=max_iter, seed=seed, **kwargs)
    # np.asarray over a jax array is a read-only view; the retry loop below
    # writes per-design improvements in place, so take writable copies.
    bbs, energies = np.array(bbs), np.array(energies)
    for attempt in range(1, max_retries + 1):
        med = float(np.median(energies))
        bad = energies > retry_factor * max(med, 1e-6)
        if not bad.any():
            break
        idx = np.nonzero(bad)[0]
        # Re-run the FULL batch (not the flagged subset): the jitted program
        # is shape-specialized on (D, R, L, 3, 3), so a subset would retrace
        # and recompile — minutes over the axon tunnel at N=256. Fresh
        # restart seeds; improvements are kept only at the flagged indices.
        bbs_r, es_r = realize_batch(
            samples_cnn, n_restarts=n_restarts, max_iter=max_iter,
            seed=seed + 7919 * attempt, **kwargs,
        )
        for i in idx:
            if es_r[i] < energies[i]:
                bbs[i], energies[i] = bbs_r[i], es_r[i]
    med = float(np.median(energies))
    flags = energies > retry_factor * max(med, 1e-6)
    return bbs, energies, flags


def realize_6d_sample(coords_6d_cnn: np.ndarray, seq: str | None = None,
                      **kwargs):
    """One-call path from a sampled (C, N, N) map to a backbone
    (the `sampling_rosetta.py` per-design body)."""
    msk = np.round(coords_6d_cnn[-1])
    L = int(round(np.sqrt((msk == 1).sum())))
    npz = inverse_scale(coords_6d_cnn, L)
    if seq is None:
        seq = "A" * L  # polyalanine (`sampling_rosetta.py:85`)
    return run_minimization(npz, seq, **kwargs)
