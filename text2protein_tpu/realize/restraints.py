"""6D maps -> dense restraint tensors + masked restraint energies.

Faithful to `/root/reference/rosetta_min/utils.py:119-231` re-designed as
dense masked (L, L) computations (TPU-friendly; no per-pair Python objects):

  * inverse scaling of sampled maps: dist=(d+1)*10, omega/theta=x*pi,
    phi=(x+1)*pi/2 (`/root/reference/sampling_rosetta.py:88-96`);
  * pair filter: any pair with dist > 12 A contributes NO restraints;
  * dist:  HarmonicFunc(mean, dist_std) on Cb-Cb, upper triangle;
  * omega: CircularHarmonic dihedral Ca-Cb-Cb-Ca, upper triangle;
  * theta: CircularHarmonic dihedral N-Ca-Cb-Cb, full asymmetric L x L;
  * phi:   Harmonic angle Ca-Cb-Cb, full asymmetric L x L;
  * staged sequence-separation bands sep1 <= |i-j| < sep2
    (`add_rst`, utils.py:207-231`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct

from .geometry import virtual_cb_from_backbone, dihedral4, angle3

DIST_FILTER = 12.0


def inverse_scale(coords_6d_cnn: np.ndarray, L: int) -> dict:
    """Sampled (C, N, N) map -> absolute-unit (L, L) target dicts
    (`/root/reference/sampling_rosetta.py:69-96`)."""
    msk = np.round(coords_6d_cnn[-1])
    l_check = math.sqrt(int((msk == 1).sum()))
    if not float(l_check).is_integer():
        raise ValueError("Terminated due to improper masking channel...")
    assert int(l_check) == L, (l_check, L)
    npz = {}
    for idx, name in enumerate(["dist", "omega", "theta", "phi"]):
        npz[name] = np.clip(coords_6d_cnn[idx][msk == 1].reshape(L, L), -1, 1)
    npz["dist_abs"] = (npz["dist"] + 1) * 10
    npz["omega_abs"] = npz["omega"] * math.pi
    npz["theta_abs"] = npz["theta"] * math.pi
    npz["phi_abs"] = (npz["phi"] + 1) * math.pi / 2
    return npz


@struct.dataclass
class Restraints:
    """Dense target maps + per-type validity masks (all (L, L)); a PyTree so
    it crosses jit/vmap boundaries."""

    dist: jnp.ndarray
    omega: jnp.ndarray
    theta: jnp.ndarray
    phi: jnp.ndarray
    mask_dist: jnp.ndarray   # upper-tri, dist>0, not filtered
    mask_omega: jnp.ndarray  # upper-tri, |omega|>0, not filtered
    mask_full: jnp.ndarray   # not filtered (theta/phi run on full L x L)
    sep: jnp.ndarray         # |i-j| matrix
    dist_std: float = struct.field(pytree_node=False, default=2.0)
    angle_std: float = struct.field(pytree_node=False, default=0.1745)


def restraints_from_maps(npz: dict, dist_std=2.0, angle_std=10.0) -> Restraints:
    dist = np.asarray(npz["dist_abs"], np.float32)
    omega = np.asarray(npz["omega_abs"], np.float32)
    theta = np.asarray(npz["theta_abs"], np.float32)
    phi = np.asarray(npz["phi_abs"], np.float32)
    L = dist.shape[0]

    not_filtered = dist <= DIST_FILTER
    triu = np.triu(np.ones((L, L), bool), 1)
    mask_dist = triu & (np.triu(dist, 1) > 0) & not_filtered
    mask_omega = triu & (np.abs(np.triu(omega, 1)) > 0) & not_filtered
    mask_full = not_filtered

    idx = np.arange(L)
    sep = np.abs(idx[:, None] - idx[None, :]).astype(np.float32)

    return Restraints(
        dist=jnp.asarray(dist),
        omega=jnp.asarray(omega),
        theta=jnp.asarray(theta),
        phi=jnp.asarray(phi),
        mask_dist=jnp.asarray(mask_dist),
        mask_omega=jnp.asarray(mask_omega),
        mask_full=jnp.asarray(mask_full),
        sep=jnp.asarray(sep),
        dist_std=float(dist_std),
        angle_std=float(np.deg2rad(angle_std)),
    )


def _circular_sq(x, mean):
    d = x - mean
    d = jnp.arctan2(jnp.sin(d), jnp.cos(d))  # wrap to (-pi, pi]
    return d * d


def restraint_energy(bb, rst: Restraints, sep_max, weights):
    """Total restraint energy of a backbone under the active seq-sep bands.

    Args:
      bb: (L, 3, 3) backbone coords.
      rst: Restraints.
      sep_max: pairs with 3 <= |i-j| < sep_max are active (the staged
        cumulative schedule of run.py:129-145 — short+medium+long unions).
      weights: dict with 'dist', 'orient' (Rosetta atom_pair / dihedral+angle
        constraint weights of the run ladder, run.py:5-7,92-95).
    Returns scalar energy.
    """
    n = bb[:, 0]
    ca = bb[:, 1]
    cb = virtual_cb_from_backbone(bb)

    band = (rst.sep >= 3) & (rst.sep < sep_max)

    ca_i, ca_j = ca[:, None, :], ca[None, :, :]
    cb_i, cb_j = cb[:, None, :], cb[None, :, :]
    n_i = n[:, None, :]

    # Double-where NaN guard: at masked-out pairs (i == j and beyond-cutoff),
    # substitute a non-degenerate fake Cb_j BEFORE the angle math — masking
    # afterwards does not stop NaN gradients from the dead branch.
    safe = rst.mask_full[..., None]
    cb_j = jnp.where(safe, cb_j, cb_i + jnp.array([3.0, 0.0, 0.0]))
    ca_j = jnp.where(safe, ca_j, ca_i + jnp.array([3.0, 3.0, 0.0]))

    # --- dist: harmonic on |Cb_i - Cb_j|
    diff = cb_i - cb_j
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    e_dist = ((d - rst.dist) / rst.dist_std) ** 2
    m = rst.mask_dist & band
    e = weights["dist"] * jnp.sum(jnp.where(m, e_dist, 0.0))
    om = dihedral4(ca_i, cb_i, cb_j, ca_j)
    e_om = _circular_sq(om, rst.omega) / rst.angle_std**2
    m = rst.mask_omega & band
    e += weights["orient"] * jnp.sum(jnp.where(m, e_om, 0.0))

    # --- theta: N_i - Ca_i - Cb_i - Cb_j dihedral (full asymmetric)
    th = dihedral4(n_i, ca_i, cb_i, cb_j)
    e_th = _circular_sq(th, rst.theta) / rst.angle_std**2
    m = rst.mask_full & band
    e += weights["orient"] * jnp.sum(jnp.where(m, e_th, 0.0))

    # --- phi: Ca_i - Cb_i - Cb_j angle (harmonic, full asymmetric)
    ph = angle3(ca_i, cb_i, cb_j)
    e_ph = ((ph - rst.phi) / rst.angle_std) ** 2
    e += weights["orient"] * jnp.sum(jnp.where(m, e_ph, 0.0))

    return e


def ca_coordinate_energy(bb, ca_ref, std=1.0, tol=1.0):
    """Flat-harmonic CA coordinate restraints (`add_crd_rst`,
    `/root/reference/rosetta_min/utils.py:96-117`): zero inside +-tol, then
    harmonic — anchors the relax stage to the minimized pose."""
    ca = bb[:, 1]
    d = jnp.sqrt(jnp.sum((ca - ca_ref) ** 2, axis=-1) + 1e-12)
    viol = jnp.maximum(d - tol, 0.0) / std
    return jnp.sum(viol * viol)


def clash_energy(bb, r_clash=4.0):
    """Soft CA-CA clash repulsion (the centroid vdw term's role in
    remove_clash, `/root/reference/rosetta_min/utils.py:90-95`)."""
    ca = bb[:, 1]
    L = ca.shape[0]
    diff = ca[:, None, :] - ca[None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    idx = jnp.arange(L)
    nonadj = jnp.abs(idx[:, None] - idx[None, :]) >= 2
    viol = jnp.maximum(r_clash - d, 0.0)
    return jnp.sum(jnp.where(nonadj, viol * viol, 0.0)) / 2.0
