"""Count alpha-helices directly from a 6D map's distance channel.

The text-conditioning proof (VERDICT r2 #1) needs a caption-contrast eval:
sample at one fixed length under captions naming different helix counts and
measure whether the generated structures track the caption. Realizing every
sample and running P-SEA would work but is slow and adds realization noise;
the near-diagonal of the Cb-Cb distance channel already identifies helices —
in an ideal alpha-helix d(Cb_i, Cb_{i+4}) ~ 5.5-6.5 A while across turns and
in extended segments it exceeds ~9 A.

Detector: flag residue i "helical" when d(i, i+4) < `thresh`; a helix is a
run of >= `min_run` consecutive flags, with single-flag gaps bridged (one
jittered torsion pair mid-helix shouldn't split it). Accuracy is measured on
ground-truth corpus maps by `scripts/eval_text_contrast.py` before it is
trusted on samples.

Reference map semantics: dist channel stores d/10 - 1 (d in [0, 20] A)
(`/root/reference/dataset.py:437-446`, inverse at
`/root/reference/sampling_rosetta.py:88-96`).
"""

from __future__ import annotations

import numpy as np


def helix_flags(c6d: np.ndarray, L: int, thresh: float = 7.5) -> np.ndarray:
    """(L-4,) bool: is the i..i+4 step helical, from a (C, N, N) map."""
    x = np.asarray(c6d)[0]  # dist channel, normalized d/10 - 1
    i = np.arange(L - 4)
    d = (np.clip(x[i, i + 4], -1.0, 1.0) + 1.0) * 10.0
    return d < thresh


def count_helices(c6d: np.ndarray, L: int, dcut: float = 12.0,
                  kmax: int = 8, kmin: int = 2, need: int = 6,
                  min_sep: int = 10) -> int:
    """Number of helices in a (C, N, N) 6D map of an L-residue chain.

    Counts chain REVERSALS rather than helical runs: a turn at position t
    makes an anti-diagonal contact streak d(t-k, t+k) < dcut for k up to
    half a helix length, while tight turns also mimic helical d(i,i+4)
    locally (which broke the run-based counter: 54% exact on GT). Detects
    local maxima of the anti-diagonal contact count (>= `need` of
    k in [kmin, kmax]) with `min_sep` non-max suppression; helices =
    reversals + 1. 98.7% exact-match against captioned helix counts on the
    decorrelated synthetic corpus GT maps (tuned there; see
    scripts/eval_text_contrast.py step 1 for per-run validation).
    """
    x = np.asarray(c6d)[0]
    d = (np.clip(x[:L, :L], -1.0, 1.0) + 1.0) * 10.0
    ks = np.arange(kmin, kmax + 1)
    score = np.zeros(L)
    t = np.arange(L)
    for k in ks:
        ok = (t - k >= 0) & (t + k < L)
        tt = t[ok]
        score[tt] += (d[tt - k, tt + k] < dcut)
    turns: list[int] = []
    for t0 in np.argsort(-score):
        if score[t0] < need:
            break
        if all(abs(int(t0) - u) >= min_sep for u in turns):
            turns.append(int(t0))
    return len(turns) + 1


def helix_fraction(c6d: np.ndarray, L: int, thresh: float = 7.5) -> float:
    """Fraction of i,i+4 steps that are helical — a coarse SS-content proxy."""
    f = helix_flags(c6d, L, thresh)
    return float(f.mean()) if f.size else 0.0
