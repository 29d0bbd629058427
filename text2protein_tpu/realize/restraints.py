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

import jax
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
    mask_long: jnp.ndarray   # upper-tri, DIST_FILTER < dist < dmax (weak band)
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
    # weak long-range band: distances between the reference's 12 A restraint
    # filter and the featurizer clamp (dmax=20) carry real information the
    # reference discards; exposed as a separate mask for long_dist_energy
    mask_long = triu & (dist > DIST_FILTER) & (dist < 19.5)

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
        mask_long=jnp.asarray(mask_long),
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


def long_dist_energy(bb, rst: Restraints, std: float = 3.0):
    """Weak harmonic on the 12-20 A distance band (beyond the reference's
    restraint filter) — regularizes loosely-contacted segments whose relative
    placement the <12 A restraints under-determine (lever-arm folds)."""
    from .geometry import virtual_cb_from_backbone

    cb = virtual_cb_from_backbone(bb)
    diff = cb[:, None, :] - cb[None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-12)
    e = ((d - rst.dist) / std) ** 2
    return jnp.sum(jnp.where(rst.mask_long, e, 0.0))


def ca_coordinate_energy(bb, ca_ref, std=1.0, tol=1.0):
    """Flat-harmonic CA coordinate restraints (`add_crd_rst`,
    `/root/reference/rosetta_min/utils.py:96-117`): zero inside +-tol, then
    harmonic — anchors the relax stage to the minimized pose."""
    ca = bb[:, 1]
    d = jnp.sqrt(jnp.sum((ca - ca_ref) ** 2, axis=-1) + 1e-12)
    viol = jnp.maximum(d - tol, 0.0) / std
    return jnp.sum(viol * viol)


def bonded_energy(bb, len_std=0.02, ang_std=0.035, omega_std=0.1):
    """Covalent backbone geometry energy for Cartesian-space minimization
    (the cart_bonded term's role, `/root/reference/rosetta_min/data/
    scorefxn_cart.wts`): harmonic bond lengths (N-CA, CA-C, C-N), bond angles
    (N-CA-C, CA-C-N, C-N-CA) at Engh & Huber ideals, plus the omega-planarity
    term (`scorefxn.wts` omega 0.5 — circular harmonic about trans)."""
    from .geometry import (
        B_N_CA, B_CA_C, B_C_N, A_N_CA_C, A_CA_C_N, A_C_N_CA,
    )

    n, ca, c = bb[:, 0], bb[:, 1], bb[:, 2]

    def blen(a, b, b0):
        d = jnp.sqrt(jnp.sum((a - b) ** 2, -1) + 1e-12)
        return jnp.sum(((d - b0) / len_std) ** 2)

    def bang(a, b, cc, a0):
        return jnp.sum(((angle3(a, b, cc) - a0) / ang_std) ** 2)

    e = blen(n, ca, B_N_CA) + blen(ca, c, B_CA_C) + blen(c[:-1], n[1:], B_C_N)
    e += (
        bang(n, ca, c, A_N_CA_C)
        + bang(ca[:-1], c[:-1], n[1:], A_CA_C_N)
        + bang(c[:-1], n[1:], ca[1:], A_C_N_CA)
    )
    om = dihedral4(ca[:-1], c[:-1], n[1:], ca[1:])
    e += jnp.sum(_circular_sq(om, jnp.pi)) / omega_std**2
    return e


# Ramachandran basin parameters for the smooth statistical torsion prior:
# von Mises mixture centered on the allowed basins (alpha-R, beta/PPII,
# alpha-L), mirroring the bin table used for pose init
# (`/root/reference/rosetta_min/utils.py:37-70`).
_RAMA_MU = np.deg2rad(
    np.array(
        [
            [-61.0, -41.0],  # alpha-R
            [-120.0, 135.0],  # beta
            [-72.0, 145.0],  # PPII
            [57.0, 39.0],  # alpha-L
        ]
    )
).astype(np.float32)
_RAMA_W = np.array([0.45, 0.25, 0.25, 0.05], np.float32)
_RAMA_KAPPA = np.array(
    [[4.0, 4.0], [2.0, 2.0], [3.0, 3.0], [5.0, 5.0]], np.float32
)


def rama_energy(phi, psi):
    """Smooth Ramachandran prior: -log of a von Mises mixture over the
    allowed basins (the centroid `rama` term's role, weight 1.0 in
    `/root/reference/rosetta_min/data/scorefxn.wts`). Differentiable, O(L)."""
    mu = jnp.asarray(_RAMA_MU)
    w = jnp.asarray(_RAMA_W)
    kap = jnp.asarray(_RAMA_KAPPA)
    # (L, K) log-density per basin (unnormalized)
    lp = (
        kap[None, :, 0] * (jnp.cos(phi[:, None] - mu[None, :, 0]) - 1.0)
        + kap[None, :, 1] * (jnp.cos(psi[:, None] - mu[None, :, 1]) - 1.0)
        + jnp.log(w)[None, :]
    )
    return -jnp.sum(jax.nn.logsumexp(lp, axis=-1))


def rama_energy_cartesian(bb):
    """rama_energy evaluated on torsions measured from Cartesian coordinates
    (differentiable through dihedral4); interior residues only."""
    n, ca, c = bb[:, 0], bb[:, 1], bb[:, 2]
    phi = dihedral4(c[:-1], n[1:], ca[1:], c[1:])  # residues 1..L-1
    psi = dihedral4(n[:-1], ca[:-1], c[:-1], n[1:])  # residues 0..L-2
    return rama_energy(phi[:-1], psi[1:])  # align: residues 1..L-2


def backbone_o_positions(bb):
    """Carbonyl O placed from the peptide-plane geometry: in the C(i) frame,
    opposite the C(i)->N(i+1) direction, 1.231 A, 121 deg from CA-C.
    Last residue's O uses the psi-plane fallback."""
    n, ca, c = bb[:, 0], bb[:, 1], bb[:, 2]
    nn = jnp.concatenate([n[1:], (2 * c[-1] - ca[-1])[None]], axis=0)
    v1 = ca - c
    v2 = nn - c
    v1 = v1 / jnp.sqrt(jnp.sum(v1 * v1, -1, keepdims=True) + 1e-12)
    v2 = v2 / jnp.sqrt(jnp.sum(v2 * v2, -1, keepdims=True) + 1e-12)
    bis = v1 + v2
    bis = bis / jnp.sqrt(jnp.sum(bis * bis, -1, keepdims=True) + 1e-12)
    return c - 1.231 * bis


def hbond_energy(bb, d0=2.95, d_sigma=0.35, sep_min=2):
    """Backbone H-bond well (the centroid `cen_hb` / `hbond_sr_bb+lr_bb`
    terms' role, `/root/reference/rosetta_min/data/scorefxn*.wts`): attractive
    Gaussian well on donor N(i) ... acceptor O(j) distance, gated by the
    N-H...O collinearity (H placed ideally opposite the N neighbors' bisector)
    and capped at one bond per donor (softmax-free: best-well max).
    Returns a NEGATIVE number (more H-bonds -> lower energy)."""
    n, ca, c = bb[:, 0], bb[:, 1], bb[:, 2]
    o = backbone_o_positions(bb)
    L = bb.shape[0]

    # ideal amide H direction: opposite bisector of (CA-N, C_prev-N)
    cprev = jnp.concatenate([(2 * n[0] - ca[0])[None], c[:-1]], axis=0)
    u = ca - n
    v = cprev - n
    u = u / jnp.sqrt(jnp.sum(u * u, -1, keepdims=True) + 1e-12)
    v = v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-12)
    hdir = -(u + v)
    hdir = hdir / jnp.sqrt(jnp.sum(hdir * hdir, -1, keepdims=True) + 1e-12)

    rel = o[None, :, :] - n[:, None, :]  # donor i, acceptor j
    d = jnp.sqrt(jnp.sum(rel * rel, -1) + 1e-12)
    relu = rel / d[..., None]
    colin = jnp.sum(relu * hdir[:, None, :], -1)  # cos(N->O vs N-H)
    well = jnp.exp(-(((d - d0) / d_sigma) ** 2)) * jnp.clip(colin, 0.0, 1.0) ** 2

    idx = jnp.arange(L)
    sep_ok = jnp.abs(idx[:, None] - idx[None, :]) >= sep_min
    well = jnp.where(sep_ok, well, 0.0)
    # one H-bond per donor: soft max over acceptors
    per_donor = jnp.max(well, axis=1)
    return -jnp.sum(per_donor)


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
