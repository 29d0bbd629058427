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


def count_helices(c6d: np.ndarray, L: int, thresh: float = 7.5,
                  min_run: int = 4, bridge: int = 1) -> int:
    """Number of helices in a (C, N, N) 6D map of an L-residue chain."""
    f = helix_flags(c6d, L, thresh)
    # bridge short False gaps inside otherwise-helical stretches
    if bridge > 0 and f.size > 2:
        g = f.copy()
        run = 0
        for i in range(len(f)):
            if f[i]:
                if 0 < run <= bridge and i - run - 1 >= 0 and f[i - run - 1]:
                    g[i - run:i] = True
                run = 0
            else:
                run += 1
        f = g
    # count runs >= min_run
    n, run = 0, 0
    for v in f:
        if v:
            run += 1
        else:
            if run >= min_run:
                n += 1
            run = 0
    if run >= min_run:
        n += 1
    return n


def helix_fraction(c6d: np.ndarray, L: int, thresh: float = 7.5) -> float:
    """Fraction of i,i+4 steps that are helical — a coarse SS-content proxy."""
    f = helix_flags(c6d, L, thresh)
    return float(f.mean()) if f.size else 0.0
