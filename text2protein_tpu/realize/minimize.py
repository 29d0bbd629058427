"""Restrained torsion-space minimization: 6D maps -> 3D backbone.

The capability of `/root/reference/rosetta_min/run.py:9-151` (PyRosetta
MinMover protocol), re-designed TPU-native: the full protocol — Ramachandran
random init, 5 restart runs with vdw/constraint weight ladders, staged
short(3-12)/medium(12-24)/long(24-L) sequence-separation restraint addition,
L-BFGS minimization, keep the lowest-energy pose — is a pure-JAX program.
Restarts run as a vmapped batch (the reference runs them serially on CPU);
designs batch the same way one level up.
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
    ca_coordinate_energy,
    inverse_scale,
)

# Weight ladders (`/root/reference/rosetta_min/run.py:5-7`): key = run index,
# default for later runs = last value.
VDW_WEIGHT = {0: 3.0, 1: 5.0, 2: 10.0}
RSR_DIST_WEIGHT = {0: 3.0, 1: 2.0, 3: 1.0}
RSR_ORIENT_WEIGHT = {0: 1.0, 1: 1.0, 3: 0.5}

STAGES = (12.0, 24.0, 1e9)  # short / medium / long seq-sep uppers (cumulative)


def _lbfgs_minimize(energy_fn, x0, max_iter=150):
    """L-BFGS with zoom linesearch (optax), fixed-iteration fori loop."""
    solver = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(energy_fn)

    def step(carry, _):
        x, state = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = solver.update(
            grad, state, x, value=value, grad=grad, value_fn=energy_fn
        )
        x = optax.apply_updates(x, updates)
        return (x, state), None

    state0 = solver.init(x0)
    (x, _), _ = jax.lax.scan(step, (x0, state0), None, length=max_iter)
    return x


def minimize_torsions(key, rst: Restraints, L: int, n_restarts: int = 5,
                      max_iter: int = 150, fixed_torsions=None,
                      design_mask=None):
    """Run the full staged multi-restart protocol; returns the best backbone.

    All restarts execute as one vmapped batch on device.

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
    the input pose, in torsion space."""
    phi, psi, _ = _torsions_from_backbone(bb0)
    ca_ref = bb0[:, 1]
    x0 = jnp.stack([phi, psi], axis=0)

    def energy(x):
        bb = build_backbone(x[0], x[1])
        e = restraint_energy(bb, rst, 1e9, {"dist": 1.0, "orient": 1.0})
        e = e + clash_energy(bb)
        return e + ca_coordinate_energy(bb, ca_ref, std=crd_std, tol=crd_tol)

    x = _lbfgs_minimize(energy, x0, max_iter)
    bb = build_backbone(x[0], x[1])
    return bb, energy(x)


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
):
    """API mirror of `/root/reference/rosetta_min/run.py:9-19`: absolute-unit
    restraint maps + sequence -> minimized backbone written as PDB. With
    `use_fastrelax`, a final CA-coordinate-restrained relax round runs on the
    best pose (run.py:180-232's role).

    Motif scaffolding: `pose_bb` ((L, 3, 3) input backbone) fixes the
    torsions of residues whose `seq` character is NOT '_' and redesigns only
    the masked ('_') spans — run.py:68-87's masked-input-pose path.

    Returns (backbone (L, 3, 3) np.ndarray, best_energy, all_energies).
    """
    L = len(seq)
    rst = restraints_from_maps(npz, dist_std=dist_std, angle_std=angle_std)
    key = jax.random.PRNGKey(seed)
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

    if outPath is not None:
        from ..data.pdbio import write_backbone_pdb

        outPath = Path(outPath)
        outPath.mkdir(parents=True, exist_ok=True)
        write_backbone_pdb(
            outPath / "structure_before_design.pdb", np.asarray(bb), seq=seq
        )

    if use_fastrelax:
        bb_rel, e_rel = relax_backbone(jnp.asarray(bb), rst, max_iter=max_iter)
        if float(e_rel) < float(e_best):
            bb, e_best = bb_rel, e_rel
        if outPath is not None:
            write_backbone_pdb(
                outPath / "final_structure.pdb", np.asarray(bb), seq=seq
            )

    return np.asarray(bb), float(e_best), np.asarray(energies)


def realize_batch(samples_cnn, n_restarts: int = 5, max_iter: int = 150,
                  seed: int = 0, angle_std: float = 10.0, dist_std: float = 2.0):
    """Batched realization: D same-length designs minimized concurrently on
    device — restarts AND designs vmapped (the reference runs one PyRosetta
    design at a time on CPU).

    Args:
      samples_cnn: (D, C, N, N) sampled maps, all with the same real length.
    Returns:
      (backbones (D, L, 3, 3), best energies (D,)).
    """
    samples_cnn = np.asarray(samples_cnn)
    msk0 = np.round(samples_cnn[0, -1])
    L = int(round(np.sqrt((msk0 == 1).sum())))
    rsts = []
    for s in samples_cnn:
        npz = inverse_scale(s, L)
        rsts.append(restraints_from_maps(npz, dist_std=dist_std,
                                         angle_std=angle_std))
    rst_batched = jax.tree.map(lambda *xs: jnp.stack(xs), *rsts)

    keys = jax.random.split(jax.random.PRNGKey(seed), len(rsts))

    @functools.partial(jax.jit, static_argnames=("L", "n_restarts", "max_iter"))
    def run(keys, rst, L, n_restarts, max_iter):
        return jax.vmap(
            lambda k, r: minimize_torsions(k, r, L, n_restarts, max_iter)[:2]
        )(keys, rst)

    bbs, energies = run(keys, rst_batched, L, n_restarts, max_iter)
    return np.asarray(bbs), np.asarray(energies)


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
