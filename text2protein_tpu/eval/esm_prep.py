"""ESM inverse-folding preprocessing hook.

The reference ships a never-integrated ESM-IF1 demo (`/root/reference/
esm_preprocess.py:4-34`: torch.hub load + CA contact-map plot). The useful
capability — producing ESM-IF1-ready inputs from designed backbones — is
provided here without the hub download: extract per-chain N/CA/C coords (the
input format `esm.inverse_folding.util.load_coords` returns) and a CA-CA
contact map.
"""

from __future__ import annotations

import numpy as np

from ..data.pdbio import read_pdb
from ..data.vocab import THREE_TO_ONE, NON_STANDARD_TO_STANDARD


def load_coords(path, chain="A"):
    """(L, 3, 3) N/CA/C coords + sequence for one chain — the ESM-IF1 input
    contract (missing atoms are NaN, as esm expects)."""
    st = read_pdb(path).filter_chain(chain)
    residues = st.amino_residues()
    coords = np.full((len(residues), 3, 3), np.nan, dtype=np.float64)
    seq = []
    for i, r in enumerate(residues):
        name = r.name if r.name in THREE_TO_ONE else NON_STANDARD_TO_STANDARD.get(r.name, "UNK")
        seq.append(THREE_TO_ONE[name])
        for j, a in enumerate(("N", "CA", "C")):
            c = r.atom(a)
            if c is not None:
                coords[i, j] = c
    return coords, "".join(seq)


def contact_map(coords, threshold=8.0):
    """CA-CA contact map (the demo's plotted quantity)."""
    ca = coords[:, 1]
    d = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1)
    return (d < threshold) & np.isfinite(d)
