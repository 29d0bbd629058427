"""TM-score structural similarity (Kabsch superposition + DP alignment).

Capability parity with the reference's two TM paths:
  * the tmtools Python binding used by `/root/reference/tm/TMalign.py:24-61`;
  * the bundled Zhang-lab C++ TMalign binary invoked as a subprocess
    (`/root/reference/utils.py:150-158`).

`tm_score` implements the TM-align core: several initial alignments (gapless
threading, local-fragment superposition), then iterative refinement
alternating Kabsch superposition of the aligned pairs with Needleman-Wunsch
DP on the TM-score matrix. `run_tmalign` shells out to our native C++ tool
(native/tmalign) with the same CLI contract as the reference binary.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

import numpy as np

_NATIVE_BINARY = Path(__file__).resolve().parents[2] / "native" / "tmalign" / "tmalign"


def d0_for_length(l_target: int) -> float:
    """Zhang & Skolnick normalization distance."""
    if l_target > 21:
        d0 = 1.24 * (l_target - 15) ** (1.0 / 3.0) - 1.8
    else:
        d0 = 0.5
    return max(d0, 0.5)


def kabsch(p: np.ndarray, q: np.ndarray):
    """Optimal rotation/translation superposing p onto q (both (L, 3)).

    Returns (R, t) with q ~ p @ R.T + t. Classic Kabsch via SVD, the same
    operation as `/root/reference/tm/TMalign.cpp:983`.
    """
    pc = p.mean(axis=0)
    qc = q.mean(axis=0)
    h = (p - pc).T @ (q - qc)
    if not np.isfinite(h).all():
        return np.eye(3), qc - pc  # degenerate input: no rotation
    try:
        u, s, vt = np.linalg.svd(h)
    except np.linalg.LinAlgError:
        return np.eye(3), qc - pc
    d = np.sign(np.linalg.det(vt.T @ u.T))
    diag = np.diag([1.0, 1.0, d])
    r = vt.T @ diag @ u.T
    t = qc - pc @ r.T
    return r, t


def _tm_of_alignment(xa, ya, l_target, d0):
    """TM-score of already-paired coords (after optimal superposition on the
    best-scoring subset, via the standard iterative cutoff scheme)."""
    best = 0.0
    n = len(xa)
    if n < 3:
        return 0.0
    # iterative superposition on shrinking inlier sets (TM-score protocol)
    idx = np.arange(n)
    for d_cut in (d0 + 1.5, d0 + 0.5, d0, d0 - 0.5):
        d_cut = max(d_cut, 0.5)
        sel = idx
        for _ in range(10):
            if len(sel) < 3:
                break
            r, t = kabsch(xa[sel], ya[sel])
            xt = xa @ r.T + t
            dist = np.linalg.norm(xt - ya, axis=1)
            score = float(np.sum(1.0 / (1.0 + (dist / d0) ** 2)) / l_target)
            best = max(best, score)
            new_sel = idx[dist < d_cut]
            if len(new_sel) < 3 or np.array_equal(new_sel, sel):
                break
            sel = new_sel
    return best


def _nw_dp(score_mat, gap_open=-0.6):
    """Needleman-Wunsch with linear gap penalty; returns index pairs."""
    l1, l2 = score_mat.shape
    val = np.zeros((l1 + 1, l2 + 1))
    ptr = np.zeros((l1 + 1, l2 + 1), dtype=np.int8)  # 0 diag, 1 up, 2 left
    for i in range(1, l1 + 1):
        val[i, 0] = val[i - 1, 0] + gap_open
        ptr[i, 0] = 1
    for j in range(1, l2 + 1):
        val[0, j] = val[0, j - 1] + gap_open
        ptr[0, j] = 2
    for i in range(1, l1 + 1):
        diag = val[:-1, :-1][i - 1] + score_mat[i - 1]
        for j in range(1, l2 + 1):
            d = val[i - 1, j - 1] + score_mat[i - 1, j - 1]
            u = val[i - 1, j] + gap_open
            l = val[i, j - 1] + gap_open
            if d >= u and d >= l:
                val[i, j] = d
            elif u >= l:
                val[i, j] = u
                ptr[i, j] = 1
            else:
                val[i, j] = l
                ptr[i, j] = 2
    pairs = []
    i, j = l1, l2
    while i > 0 and j > 0:
        p = ptr[i, j]
        if p == 0:
            pairs.append((i - 1, j - 1))
            i -= 1
            j -= 1
        elif p == 1:
            i -= 1
        else:
            j -= 1
    return pairs[::-1]


def _initial_alignments(x, y):
    """Candidate seed alignments: gapless threads + fragment superpositions."""
    l1, l2 = len(x), len(y)
    cands = []
    # gapless threading at several offsets
    for off in range(-(l1 - 5), l2 - 4, max(1, min(l1, l2) // 10)):
        i0, j0 = max(0, -off), max(0, off)
        n = min(l1 - i0, l2 - j0)
        if n >= 5:
            cands.append(list(zip(range(i0, i0 + n), range(j0, j0 + n))))
    # central-fragment seed
    f = min(l1, l2, 20)
    cands.append(list(zip(range(f), range(f))))
    return cands


def tm_score(coords1, coords2, l_target: int | None = None, max_iter: int = 20):
    """TM-score of structure 1 vs structure 2 (CA coords, (L, 3) each),
    normalized by `l_target` (defaults to len(coords2) — the reference's
    `tm_norm_chain2`, `/root/reference/tm/TMalign.py:47-53`)."""
    x = np.asarray(coords1, dtype=np.float64)
    y = np.asarray(coords2, dtype=np.float64)
    l_target = l_target or len(y)
    d0 = d0_for_length(l_target)

    best_tm = 0.0
    best_pairs = None
    for pairs in _initial_alignments(x, y):
        idx = np.array(pairs)
        tm = _tm_of_alignment(x[idx[:, 0]], y[idx[:, 1]], l_target, d0)
        if tm > best_tm:
            best_tm, best_pairs = tm, pairs

    if best_pairs is None:
        return 0.0

    # iterative refinement: superpose on current pairs -> TM-score matrix ->
    # NW DP -> new pairs
    pairs = best_pairs
    for _ in range(max_iter):
        idx = np.array(pairs)
        r, t = kabsch(x[idx[:, 0]], y[idx[:, 1]])
        xt = x @ r.T + t
        dist = np.linalg.norm(xt[:, None, :] - y[None, :, :], axis=-1)
        score_mat = 1.0 / (1.0 + (dist / d0) ** 2)
        new_pairs = _nw_dp(score_mat)
        if len(new_pairs) < 3:
            break
        idx = np.array(new_pairs)
        tm = _tm_of_alignment(x[idx[:, 0]], y[idx[:, 1]], l_target, d0)
        if tm > best_tm:
            best_tm = tm
        if new_pairs == pairs:
            break
        pairs = new_pairs

    return float(best_tm)


def tm_score_from_pdbs(path1, path2):
    """CA-based TM-score of two PDB files (normalized by chain 2)."""
    from ..data.pdbio import read_pdb

    def cas(path):
        res = read_pdb(path).amino_residues()
        return np.array([r.atom("CA") for r in res if r.atom("CA") is not None])

    return tm_score(cas(path1), cas(path2))


def run_tmalign(path1, path2, binary_path=None, fast=True) -> float:
    """Subprocess wrapper with the reference's CLI contract
    (`/root/reference/utils.py:150-158`): parse the first chain-1-normalized
    TM-score line; 0.0 on malformed output. Falls back to the Python
    implementation when no native binary is available."""
    binary = Path(binary_path) if binary_path else _NATIVE_BINARY
    if not binary.exists():
        return tm_score_from_pdbs(path1, path2)
    cmd = [str(binary), str(path1), str(path2)]
    if fast:
        cmd += ["-fast"]
    result = subprocess.run(cmd, capture_output=True)
    lines = result.stdout.decode("UTF-8").split("\n")
    if len(lines) < 10:
        return 0.0
    try:
        for line in lines:
            if line.startswith("TM-score=") or line.startswith("TM-score ="):
                return float(line.replace("=", " ").split()[1])
        return float(lines[13].split(" ")[1].strip())
    except (IndexError, ValueError):
        return 0.0
