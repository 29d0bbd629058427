"""trRosetta-style 6D inter-residue geometry featurization.

Produces, for a protein of length L, per-residue-pair maps
  dist  : Cb–Cb distance, clamped at dmax (=20Å), normalized to [-1, 1]
  omega : Ca–Cb–Cb–Ca dihedral / pi
  theta : N–Ca–Cb–Cb dihedral / pi
  phi   : Ca–Cb–Cb planar angle, normalized to [-1, 1]
matching the reference semantics exactly (`/root/reference/dataset.py:362-450`):
entries for pairs farther than dmax (and the diagonal) keep dist=dmax and
angles 0 *before* normalization; NaNs are zeroed afterwards.

Two implementations:
  * `get_coords6d` — numpy, dense (replaces the reference's cKDTree sparse
    scatter with a dense mask, which is exactly equivalent because out-of-range
    entries hold the fill values).
  * `get_coords6d_jax` — jnp, jit/vmap-able, for on-device batched
    featurization (a capability the reference lacks; its featurizer is
    host-side multiprocessing only, `/root/reference/dataset.py:106-112`).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

# Virtual-Cb reconstruction constants (ideal geometry), identical to
# `/root/reference/dataset.py:405-409` (originally trRosetta).
CB_A = -0.58273431
CB_B = 0.56802827
CB_C = -0.54067466

DMAX_DEFAULT = 20.0


def _dihedral_pairs(xp, a, b, c, d):
    """Dihedral angle for broadcastable point arrays (…, 3) -> (…,).

    Same math as `/root/reference/dataset.py:364-380`.
    """
    b0 = -1.0 * (b - a)
    b1 = c - b
    b2 = d - c
    b1 = b1 / xp.linalg.norm(b1, axis=-1, keepdims=True)
    v = b0 - xp.sum(b0 * b1, axis=-1, keepdims=True) * b1
    w = b2 - xp.sum(b2 * b1, axis=-1, keepdims=True) * b1
    x = xp.sum(v * w, axis=-1)
    y = xp.sum(xp.cross(b1, v) * w, axis=-1)
    return xp.arctan2(y, x)


def _planar_angle(xp, a, b, c):
    """Planar angle at b for broadcastable point arrays (…, 3) -> (…,)."""
    v = a - b
    v = v / xp.linalg.norm(v, axis=-1, keepdims=True)
    w = c - b
    w = w / xp.linalg.norm(w, axis=-1, keepdims=True)
    return xp.arccos(xp.sum(v * w, axis=-1))


def virtual_cb(xyz, xp=np):
    """Rebuild virtual Cb from N/CA/C backbone coords (..., 3 atoms, 3)."""
    n, ca, c = xyz[..., 0, :], xyz[..., 1, :], xyz[..., 2, :]
    b = ca - n
    cc = c - ca
    a = xp.cross(b, cc)
    return CB_A * a + CB_B * b + CB_C * cc + ca


def _coords6d_dense(xp, xyz, dmax, normalize):
    n = xyz[:, 0]
    ca = xyz[:, 1]
    c = xyz[:, 2]
    cb = virtual_cb(xyz, xp=xp)

    L = xyz.shape[0]
    diff = cb[None, :, :] - cb[:, None, :]          # [i, j] = Cb_j - Cb_i
    d = xp.linalg.norm(diff, axis=-1)               # (L, L)
    eye = xp.eye(L, dtype=bool)
    # cKDTree query_ball_tree uses a closed ball (d <= dmax), excluding i == j
    # via the reference's `if i != j` (`/root/reference/dataset.py:417`).
    contact = (d <= dmax) & (~eye)

    # Broadcast helpers: row quantities index i, col quantities index j.
    ca_i, ca_j = ca[:, None, :], ca[None, :, :]
    cb_i, cb_j = cb[:, None, :], cb[None, :, :]
    n_i = n[:, None, :]

    omega = _dihedral_pairs(xp, ca_i, cb_i, cb_j, ca_j)
    theta = _dihedral_pairs(xp, n_i, ca_i, cb_i, cb_j)
    phi = _planar_angle(xp, ca_i, cb_i, cb_j)

    zeros = xp.zeros_like(d)
    dist6d = xp.where(contact, d, dmax)
    omega6d = xp.where(contact, omega, zeros)
    theta6d = xp.where(contact, theta, zeros)
    phi6d = xp.where(contact, phi, zeros)

    if normalize:
        dist6d = (dist6d / dmax * 2) - 1      # -> [-1, 1]
        omega6d = omega6d / math.pi           # [-pi, pi] -> [-1, 1]
        theta6d = theta6d / math.pi
        phi6d = (phi6d / math.pi * 2) - 1     # [0, pi] -> [-1, 1]

    return xp.stack([dist6d, omega6d, theta6d, phi6d], axis=-1)


def get_coords6d(xyz, dmax=DMAX_DEFAULT, normalize=True):
    """Numpy 6D featurization. xyz: (L, 3, 3) N/CA/C coords. -> (L, L, 4)."""
    xyz = np.asarray(xyz, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = _coords6d_dense(np, xyz, dmax, normalize)
    return out


def get_coords6d_jax(xyz, dmax=DMAX_DEFAULT, normalize=True):
    """JAX 6D featurization, jit/vmap-friendly. xyz: (L, 3, 3). -> (L, L, 4).

    NaNs from degenerate geometry (e.g. zeroed masked residues) are NOT
    cleaned here — callers apply `jnp.nan_to_num`, mirroring
    `/root/reference/dataset.py:226`.
    """
    return _coords6d_dense(jnp, xyz, dmax, normalize)


def featurize_batch_jax(bb, mask_res, num_channels, ss_block=None,
                        dmax=DMAX_DEFAULT):
    """Train-time on-device featurization: padded backbones -> NHWC maps.

    The reference featurizes on the host and ships full (C, N, N) maps to the
    device every step (`/root/reference/dataset.py:396-450` + collate). Over
    a narrow host<->device link that transfer dominates the step; here the
    host ships only (B, N, 3, 3) coordinates (~100x smaller) and the maps are
    built inside the training-step jit.

    Args:
      bb:        (B, N, 3, 3) float N/CA/C coords, zero-padded past length.
      mask_res:  (B, N) bool residue-validity mask.
      num_channels: 5 or 8 (channel layout `/root/reference/dataset.py:225-239`).
      ss_block:  (B, N, N, 3) SS block channels (any int/float dtype; uint8
                 on the wire), required when num_channels == 8.
    Returns:
      (coords_6d (B, N, N, C) float32, mask_pair (B, N, N) bool) — identical
      to the host `featurize_structure` output (NHWC, masked).
    """
    geo = jax.vmap(lambda x: get_coords6d_jax(x, dmax=dmax))(
        bb.astype(jnp.float32)
    )
    mask_pair = mask_res[:, :, None] & mask_res[:, None, :]
    mp = mask_pair[..., None]
    # nan_to_num mirrors the host path (`/root/reference/dataset.py:226`);
    # the where (not multiply) blocks NaN propagation from padded residues.
    geo = jnp.where(mp, jnp.nan_to_num(geo), 0.0)
    chans = [geo]
    if num_channels == 8:
        assert ss_block is not None, "C=8 layout needs SS block channels"
        chans.append(jnp.where(mp, ss_block.astype(jnp.float32), 0.0))
    chans.append(mp.astype(jnp.float32))
    return jnp.concatenate(chans, axis=-1), mask_pair


def featurize_structure(
    bb_coords: np.ndarray,
    mask: np.ndarray,
    ss_constraints: bool,
    dmax: float = DMAX_DEFAULT,
    ca_coords: np.ndarray | None = None,
):
    """Full per-protein featurization: 6D maps + (optional) SS block channels +
    padding channel, masked, channel-first.

    Channel layout (reference `/root/reference/dataset.py:225-239`):
      C=5: [dist, omega, theta, phi, padding-mask]
      C=8: [dist, omega, theta, phi, helix-pair, beta-pair, block-adj, padding-mask]

    Returns (coords_6d (C, L, L) float32, mask_pair (L, L) bool, ss_indices str)
    or (None, None, None) when SS annotation fails.
    """
    from .ss import get_coarse_constraints

    nres = bb_coords.shape[0]
    coords_6d = get_coords6d(bb_coords, dmax=dmax, normalize=True)
    coords_6d = np.nan_to_num(coords_6d)
    padding = np.ones((nres, nres, 1))
    if ss_constraints:
        ca = ca_coords if ca_coords is not None else bb_coords[:, 1]
        block_adj, helix_beta_str = get_coarse_constraints(
            ca, coords_6d[:, :, 0], dist_threshold=5, dmax=dmax
        )
        if block_adj is None:
            return None, None, None
        coords_6d = np.concatenate([coords_6d, block_adj, padding], axis=-1)
    else:
        coords_6d = np.concatenate([coords_6d, padding], axis=-1)
        helix_beta_str = ""
    mask_pair = (mask.reshape(1, -1) * mask.reshape(-1, 1)).astype(bool)
    coords_6d = coords_6d * mask_pair.reshape(nres, nres, 1)
    return (
        coords_6d.transpose(2, 0, 1).astype(np.float32),
        mask_pair,
        helix_beta_str,
    )
