"""Sequence design (FastDesign role): physics Potts designer + learned head.

Benchmark semantics live in scripts/eval_design.py (recovery vs the
synthetic-native generator); here we pin the API contracts: determinism,
fixed-position clamps, score split, shipped-head availability, and that both
designers beat the trivial baselines on a small held-out set.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bundle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from text2protein_tpu.data.synthetic import helix_bundle_backbone

    return helix_bundle_backbone(48, seed=7, compact=False)


def test_design_deterministic(bundle):
    from text2protein_tpu.realize.design import design_sequence

    s1, e1 = design_sequence(bundle, seed=3)
    s2, e2 = design_sequence(bundle, seed=3)
    assert s1 == s2 and e1["total"] == e2["total"]
    assert len(s1) == 48
    assert set(s1) <= set("ACDEFGHIKLMNPQRSTVWY")


def test_fix_mask_clamps(bundle):
    from text2protein_tpu.realize.design import design_sequence

    fix = np.zeros(48, bool)
    fix[10:20] = True
    fixed_seq = "W" * 48
    s, _ = design_sequence(bundle, seed=0, fix_mask=fix, fixed_seq=fixed_seq)
    assert s[10:20] == "W" * 10
    assert "W" not in (s[:10] + s[20:])  # W is rare; designer won't pick it


def test_design_score_split(bundle):
    from text2protein_tpu.realize.design import design_sequence, design_score

    s, e = design_sequence(bundle, seed=1)
    sc = design_score(bundle, s)
    assert np.isclose(sc["total"], e["total"], atol=1e-3)
    # designed sequence scores far better than polyalanine
    assert sc["total"] < design_score(bundle, "A" * 48)["total"] - 1.0


def test_designed_is_amphipathic(bundle):
    """Buried positions get more hydrophobic residues than exposed ones —
    the core property any design energy must produce."""
    from text2protein_tpu.realize.design import (
        _IDX, HYD, burial_fraction, design_sequence,
    )

    s, _ = design_sequence(bundle, seed=2)
    burial = burial_fraction(bundle)
    hyd = np.array([HYD[_IDX[c]] for c in s])
    assert hyd[burial > 0.7].mean() > hyd[burial < 0.3].mean() + 0.5


def test_learned_head_ships_and_beats_physics(bundle):
    """The trained head npz is committed and decodes; recovery ordering
    (learned > physics > composition) is asserted at corpus scale by
    reports/design_recovery.json — here just the API + a weak sanity."""
    from text2protein_tpu.data.synthetic_seq import native_like_sequence
    from text2protein_tpu.realize.design_learned import InverseHead

    head = InverseHead.load()
    pred = head.design(bundle)
    assert len(pred) == 48
    nat, _, _ = native_like_sequence(bundle, seed=5, temperature=0.22)
    rec = np.mean([a == b for a, b in zip(nat, pred)])
    assert rec > 0.15  # far above the 0.05 random line

    fix = np.zeros(48, bool)
    fix[:5] = True
    clamped = head.design(bundle, fix_mask=fix, fixed_seq="G" * 48)
    assert clamped[:5] == "GGGGG"


def test_native_generator_contract(bundle):
    from text2protein_tpu.data.synthetic_seq import native_like_sequence

    s1, cls, ceil = native_like_sequence(bundle, seed=11)
    s2, _, _ = native_like_sequence(bundle, seed=11)
    s3, _, _ = native_like_sequence(bundle, seed=12)
    assert s1 == s2 and s1 != s3
    assert len(cls) == 48 and 0.0 < ceil < 1.0


def test_design_eval_split_canonical_and_disjoint():
    """The benchmark split helper must be deterministic, disjoint, and
    independent of input ordering (train_inverse_head / eval_design /
    fit_design_ref all rely on it)."""
    from text2protein_tpu.realize.design_learned import design_eval_split

    paths = [f"rec_{i:03d}.npz" for i in range(20)]
    ev1, rest1 = design_eval_split(paths, n_eval=6)
    ev2, rest2 = design_eval_split(list(reversed(paths)), n_eval=6)
    assert ev1 == ev2 and rest1 == rest2          # order-independent
    assert len(ev1) == 6 and len(rest1) == 14
    assert not set(ev1) & set(rest1)              # disjoint
    assert sorted(ev1 + rest1) == paths           # partition
    assert ev1 != sorted(ev1)                     # actually shuffled
