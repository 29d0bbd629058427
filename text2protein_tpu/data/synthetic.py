"""Synthetic protein backbones with ideal covalent geometry.

Training/validation data generators used by tests, `scripts/validate_e2e.py`
and the quality benchmarks when no PDB corpus is present. Structures are
built in torsion space through the NeRF chain builder
(`realize/geometry.build_backbone`), so bond lengths/angles are exactly ideal
and 6D featurization (`data/featurize.py`) produces self-consistent maps —
unlike a CA-trace-only generator, whose fake N/C placement yields
theta/phi orientation channels inconsistent with any ideal-geometry chain.
"""

from __future__ import annotations

import numpy as np

# Canonical alpha-helix torsions (deg).
_HELIX_PHI, _HELIX_PSI = -61.0, -41.0

# Turn-segment torsion sets (deg) that reverse chain direction compactly;
# found by direct search over 4-residue turns minimizing radius of gyration
# of a 3-helix bundle without steric clashes (scripts/exp_realize.py lineage).
_TURNS = np.array(
    [
        [[112.5, -119.4], [107.0, 166.5], [6.1, -87.9], [-122.1, 150.0]],
        [[-63.2, -1.1], [-24.0, -23.3], [95.5, 156.7], [49.2, 164.6]],
    ]
)


def default_n_helices(L: int) -> int:
    """Length-scaled helix count used by `helix_bundle_torsions` — exported
    so captions about the generated geometry stay in sync with it
    (scripts/make_synth_dataset.py)."""
    return max(2, min(6, round(L / 22)))


def valid_helix_counts(L: int) -> list[int]:
    """Helix counts buildable at length L with sane segment lengths.

    Bounds keep each helix segment between ~12 and ~40 residues (natural
    bundle range), so at a fixed L several counts are valid — the lever that
    DECORRELATES the caption's helix count from chain length for the
    text-conditioning proof (VERDICT r2 #1: round-2 captions had
    helix count = f(L), so nothing could tell whether the model read them).
    """
    n_min = max(2, -(-(L + 4) // 44))   # segment <= 40
    n_max = min(6, (L + 4) // 16)       # segment >= 12
    return list(range(n_min, max(n_min, n_max) + 1))


def helix_bundle_torsions(L: int, seed: int = 0, n_helices: int | None = None,
                          jitter_deg: float = 3.0,
                          vary_placement: bool = False):
    """(phi, psi) in radians for a compact L-residue helix bundle.

    Helix segments use canonical torsions; turns are drawn from the searched
    turn table; everything gets a small jitter so different seeds give
    different (but still compact) structures.

    `vary_placement` randomizes the per-helix segment lengths (>=5 residues
    each) instead of the default equal split. Without it, block placement is
    a deterministic function of (L, n_helices) across the corpus, so an
    SS-conditioned model can never learn to READ placement from the SS
    channels (measured: reports/quality_ss_spec.json) — any corpus meant to
    train placement steering must set this.
    """
    rng = np.random.RandomState(seed)
    if n_helices is None:
        # scale with length so bundles stay globular (~16-22 res per helix,
        # like natural helical proteins); elongated 3-helix bundles at L>90
        # have so few inter-helix contacts that their 6D maps genuinely
        # under-determine the fold
        n_helices = default_n_helices(L)
    n_turn = 4
    total_seg = L - (n_helices - 1) * n_turn
    if vary_placement:
        # random composition of total_seg into n_helices parts, each >= 5
        min_seg = 5
        free = max(total_seg - n_helices * min_seg, 0)
        cuts = np.sort(rng.randint(0, free + 1, n_helices - 1))
        parts = np.diff(np.concatenate([[0], cuts, [free]]))
        seg_lens = [min_seg + int(p) for p in parts]
    else:
        seg_lens = [total_seg // n_helices] * n_helices
    phi, psi = [], []
    for h in range(n_helices):
        n_seg = seg_lens[h] if h < n_helices - 1 else (L - len(phi))
        phi += [_HELIX_PHI] * n_seg
        psi += [_HELIX_PSI] * n_seg
        if h < n_helices - 1:
            t = _TURNS[rng.randint(len(_TURNS))]
            phi += list(t[:, 0])
            psi += list(t[:, 1])
    phi = np.asarray(phi[:L], np.float64)
    psi = np.asarray(psi[:L], np.float64)
    phi += rng.randn(L) * jitter_deg
    psi += rng.randn(L) * jitter_deg
    return np.deg2rad(phi).astype(np.float32), np.deg2rad(psi).astype(
        np.float32
    )


def _compact_run(bb0, rg_target, iters: int = 300):
    """Pure-JAX Rg-guided compaction of one (L, 3, 3) backbone: pulls the
    bundle to a native-like radius of gyration (Rg ~ 2.2 L^0.38) while
    clash, covalent-geometry, Ramachandran and H-bond terms keep it
    physical; a final pass releases the Rg pull and re-idealizes.
    vmap-able across structures of equal L (the batched corpus path)."""
    import jax.numpy as jnp

    from ..realize.restraints import (
        bonded_energy, rama_energy_cartesian, hbond_energy, clash_energy,
    )
    from ..realize.minimize import _lbfgs_minimize

    def e_compact(bb):
        ca = bb[:, 1]
        rg = jnp.sqrt(
            jnp.mean(jnp.sum((ca - ca.mean(0)) ** 2, -1)) + 1e-9
        )
        return (
            30.0 * jnp.maximum(rg - rg_target, 0.0) ** 2 * bb.shape[0]
            + 20.0 * clash_energy(bb)
            + 1.0 * bonded_energy(bb)
            + 1.0 * rama_energy_cartesian(bb)
            + 10.0 * hbond_energy(bb)
        )

    def e_polish(bb):
        return (
            20.0 * clash_energy(bb)
            + 2.0 * bonded_energy(bb, 0.01, 0.017, 0.05)
            + 1.0 * rama_energy_cartesian(bb)
            + 10.0 * hbond_energy(bb)
        )

    bb = _lbfgs_minimize(e_compact, bb0, iters)
    return _lbfgs_minimize(e_polish, bb, iters // 2)


def _compact_backbone(bb0, rg_target: float, iters: int = 300):
    import jax
    import jax.numpy as jnp

    run = jax.jit(lambda b: _compact_run(b, rg_target, iters))
    return np.asarray(run(jnp.asarray(bb0)))


def helix_bundle_backbone(L: int, seed: int = 0, n_candidates: int = 12,
                          compact: bool | None = None):
    """(L, 3, 3) ideal-geometry backbone of a compact helix bundle.

    Builds `n_candidates` torsion samples and keeps the most protein-like
    one: clash-free (CA pairs at |i-j| >= 3 farther than 3.6 A), minimal
    radius of gyration, maximal long-range contact fraction — so the 6D
    distance map actually determines the fold (an elongated bundle's map
    does not). For longer chains (or with `compact=True`) an Rg-guided
    compaction pass packs the helices to a native-like Rg.
    """
    import jax.numpy as jnp

    from ..realize.geometry import build_backbone

    best, best_score = None, np.inf
    for k in range(n_candidates):
        phi, psi = helix_bundle_torsions(L, seed=seed + 1000 * k)
        bb = np.asarray(build_backbone(jnp.asarray(phi), jnp.asarray(psi)))
        ca = bb[:, 1]
        d = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1)
        sep = np.abs(np.arange(L)[:, None] - np.arange(L)[None, :])
        # halved like the batched path (each clash appears twice in the
        # symmetric matrix) so both APIs pick the same candidate per seed
        clashes = int((d[sep >= 3] < 3.6).sum()) // 2
        rg = float(np.sqrt(((ca - ca.mean(0)) ** 2).sum(1).mean()))
        contact = float(((d < 12) & (sep >= 8)).mean())
        score = rg - 60.0 * contact + 100.0 * clashes
        if score < best_score:
            best, best_score = bb, score
    if compact is None:
        compact = L >= 72
    if compact:
        best = _compact_backbone(best, rg_target=2.2 * L**0.38)
    return best


def helix_bundle_backbones(L: int, seeds, n_candidates: int = 12,
                           compact: bool | None = None,
                           compact_iters: int = 300, n_helices=None,
                           vary_placement: bool = False):
    """Batched (len(seeds), L, 3, 3) helix-bundle backbones of equal length.

    Same selection + compaction as `helix_bundle_backbone`, but the NeRF
    build and the Rg-guided compaction are vmapped across all seeds and run
    as ONE device program — the corpus-generation path for the quality
    training runs (a single structure takes ~43 s on this host's one CPU
    core; a 48-structure batch takes seconds on the TPU).

    `n_helices`: None (length-scaled default), an int, or a per-seed list —
    the per-seed form lets one device batch mix helix counts at equal L
    (the decorrelated text-conditioning corpus)."""
    import jax
    import jax.numpy as jnp

    from ..realize.geometry import build_backbone

    seeds = list(seeds)
    if n_helices is None or isinstance(n_helices, int):
        n_helices = [n_helices] * len(seeds)
    assert len(n_helices) == len(seeds)
    phis, psis = [], []
    for s, nh in zip(seeds, n_helices):
        for k in range(n_candidates):
            phi, psi = helix_bundle_torsions(L, seed=s + 1000 * k,
                                             n_helices=nh,
                                             vary_placement=vary_placement)
            phis.append(phi)
            psis.append(psi)
    build = jax.jit(jax.vmap(build_backbone))
    bbs = np.asarray(
        build(jnp.asarray(np.stack(phis)), jnp.asarray(np.stack(psis)))
    ).reshape(len(seeds), n_candidates, L, 3, 3)

    # candidate scoring (host, cheap): clash-free, compact, many long-range
    # contacts — so the 6D distance map actually determines the fold
    ca = bbs[..., 1, :]
    d = np.linalg.norm(ca[..., :, None, :] - ca[..., None, :, :], axis=-1)
    sep = np.abs(np.arange(L)[:, None] - np.arange(L)[None, :])
    clashes = ((d < 3.6) & (sep >= 3)).sum((-1, -2)) // 2
    rg = np.sqrt(((ca - ca.mean(-2, keepdims=True)) ** 2).sum(-1).mean(-1))
    contact = ((d < 12) & (sep >= 8)).mean((-1, -2))
    score = rg - 60.0 * contact + 100.0 * clashes
    best = np.take_along_axis(
        bbs, score.argmin(1)[:, None, None, None, None], axis=1
    )[:, 0]

    if compact is None:
        compact = L >= 72
    if not compact:
        return best
    rg_target = 2.2 * L**0.38
    run = jax.jit(
        jax.vmap(lambda b: _compact_run(b, rg_target, compact_iters))
    )
    return np.asarray(run(jnp.asarray(best)))


def helix_bundle_dataset(num: int, n_max: int, seed: int = 0,
                         min_len: int = 16, ss_constraints: bool = False):
    """List of featurized records {coords_6d (C,L,L), mask_pair, L, bb} for
    synthetic-bundle training (the validate_e2e / quality-benchmark corpus)."""
    from .featurize import featurize_structure

    rng = np.random.RandomState(seed)
    records = []
    i = 0
    while len(records) < num:
        L = int(rng.randint(max(min_len, n_max // 2), n_max + 1))
        bb = helix_bundle_backbone(L, seed=seed * 77777 + i)
        i += 1
        c6d, mask_pair, ss_indices = featurize_structure(
            bb, np.ones(L), ss_constraints=ss_constraints
        )
        if c6d is None:
            continue
        records.append(
            {"coords_6d": c6d, "mask_pair": mask_pair, "L": L, "bb": bb,
             "ss_indices": ss_indices}
        )
    return records
