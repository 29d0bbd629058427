"""Differentiable backbone geometry (NeRF chain builder) in JAX.

The TPU-native replacement for PyRosetta's pose kinematics: the reference
minimizes restraint energies over backbone torsions with Rosetta MinMover
(`/root/reference/rosetta_min/run.py:90-151`); here the torsions -> Cartesian
map is an explicit differentiable `lax.scan` (Natural Extension Reference
Frame), so the whole restraint minimization runs as pure JAX — batchable with
vmap across restarts AND designs, jittable, and TPU-resident.

Ideal backbone geometry constants (Engh & Huber).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Bond lengths (A)
B_N_CA = 1.458
B_CA_C = 1.525
B_C_N = 1.329
# Bond angles (rad)
A_N_CA_C = math.radians(111.2)
A_CA_C_N = math.radians(116.2)
A_C_N_CA = math.radians(121.7)


def _place(a, b, c, r, theta, chi):
    """NeRF: place the 4th atom given 3 previous + internal coordinates.

    r = |c-d|, theta = angle(b, c, d), chi = dihedral(a, b, c, d).
    """
    bc = c - b
    bc = bc / jnp.linalg.norm(bc)
    ab = b - a
    n = jnp.cross(ab, bc)
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-8)
    m = jnp.stack([bc, jnp.cross(n, bc), n], axis=-1)  # columns
    d_local = jnp.array(
        [
            -r * jnp.cos(theta),
            r * jnp.sin(theta) * jnp.cos(chi),
            r * jnp.sin(theta) * jnp.sin(chi),
        ]
    )
    return c + m @ d_local


def build_backbone(phi, psi, omega=None):
    """Torsions -> backbone N/CA/C coordinates.

    Args:
      phi, psi: (L,) torsions in radians (phi[0] and psi[-1] are unused by the
        chain construction but kept for a uniform parameterization).
      omega: (L,) peptide-bond torsions; defaults to pi (trans).
    Returns:
      (L, 3, 3) float32 coords.
    """
    L = phi.shape[0]
    if omega is None:
        omega = jnp.full((L,), jnp.pi)

    # First residue at a canonical pose.
    n0 = jnp.array([0.0, 0.0, 0.0])
    ca0 = jnp.array([B_N_CA, 0.0, 0.0])
    c0 = _place(
        jnp.array([0.0, 1.0, 0.0]), n0, ca0, B_CA_C, A_N_CA_C, jnp.pi * 0.5
    )

    def step(carry, inp):
        n_p, ca_p, c_p = carry
        psi_p, omega_i, phi_i = inp
        n_i = _place(n_p, ca_p, c_p, B_C_N, A_CA_C_N, psi_p)
        ca_i = _place(ca_p, c_p, n_i, B_N_CA, A_C_N_CA, omega_i)
        c_i = _place(c_p, n_i, ca_i, B_CA_C, A_N_CA_C, phi_i)
        return (n_i, ca_i, c_i), jnp.stack([n_i, ca_i, c_i])

    inputs = jnp.stack([psi[:-1], omega[1:], phi[1:]], axis=-1)
    _, rest = jax.lax.scan(step, (n0, ca0, c0), inputs)
    first = jnp.stack([n0, ca0, c0])[None]
    return jnp.concatenate([first, rest], axis=0)


def virtual_cb_from_backbone(bb):
    """Virtual Cb with the featurizer's constants (dataset parity,
    `/root/reference/dataset.py:405-409`)."""
    n, ca, c = bb[..., 0, :], bb[..., 1, :], bb[..., 2, :]
    b = ca - n
    cc = c - ca
    a = jnp.cross(b, cc)
    return -0.58273431 * a + 0.56802827 * b - 0.54067466 * cc + ca


# Ramachandran bins used for pose initialization
# (`/root/reference/rosetta_min/utils.py:37-70`), degrees.
_RAMA_BINS = np.array(
    [
        [-140.0, 153.0],
        [-72.0, 145.0],
        [-122.0, 117.0],
        [-82.0, -14.0],
        [-61.0, -41.0],
        [57.0, 39.0],
    ]
)
_RAMA_PROBS = np.array([0.135, 0.155, 0.073, 0.122, 0.497, 0.018])


def random_dihedrals(key, L):
    """Per-residue (phi, psi) drawn from the Ramachandran bin table; omega
    fixed trans. Returns radians: (phi (L,), psi (L,), omega (L,))."""
    choice = jax.random.choice(
        key, _RAMA_BINS.shape[0], shape=(L,), p=jnp.asarray(_RAMA_PROBS)
    )
    bins = jnp.asarray(np.deg2rad(_RAMA_BINS))
    phi = bins[choice, 0]
    psi = bins[choice, 1]
    omega = jnp.full((L,), jnp.pi)
    return phi, psi, omega


def _safe_norm(x, eps=1e-6):
    """NaN-safe norm: masked-out singular pairs (i == j) must produce finite
    values AND finite gradients — `jnp.where(mask, e, 0)` does not block NaN
    gradients from the masked branch."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps)


def dihedral4(a, b, c, d):
    """Dihedral of 4 point sets (broadcastable), radians. Safe at coincident
    points (returns 0 there instead of NaN)."""
    b0 = -(b - a)
    b1 = c - b
    b2 = d - c
    b1 = b1 / _safe_norm(b1)
    v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
    w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1, v) * w, axis=-1)
    return jnp.arctan2(y, x + 1e-20)


def angle3(a, b, c):
    v = a - b
    v = v / _safe_norm(v)
    w = c - b
    w = w / _safe_norm(w)
    return jnp.arccos(jnp.clip(jnp.sum(v * w, axis=-1), -1.0 + 1e-7, 1.0 - 1e-7))
