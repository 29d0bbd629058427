"""Evaluation tier: Kabsch, TM-score sanity, 6D MSE."""

import numpy as np

from text2protein_tpu.eval.tmscore import kabsch, tm_score, d0_for_length
from text2protein_tpu.eval.coords_compare import mse_6d, infer_length_from_padding


def make_ca_trace(L=60, seed=0):
    """Random-walk CA trace with realistic 3.8 A virtual bonds."""
    rng = np.random.RandomState(seed)
    steps = rng.randn(L, 3)
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    # smooth the walk so it is chain-like
    for i in range(1, L):
        steps[i] = 0.6 * steps[i - 1] + 0.4 * steps[i]
        steps[i] /= np.linalg.norm(steps[i])
    return np.cumsum(3.8 * steps, axis=0)


def random_rt(seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(3, 3)
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.randn(3) * 10
    return q, t


def test_kabsch_exact_recovery():
    p = make_ca_trace(40)
    r, t = random_rt(3)
    q = p @ r.T + t
    r2, t2 = kabsch(p, q)
    np.testing.assert_allclose(p @ r2.T + t2, q, atol=1e-8)
    np.testing.assert_allclose(r2, r, atol=1e-8)


def test_tm_score_self_is_one():
    x = make_ca_trace(80)
    r, t = random_rt(1)
    y = x @ r.T + t  # rigid transform: TM = 1
    assert tm_score(x, y) > 0.999


def test_tm_score_noise_degrades():
    x = make_ca_trace(80, seed=2)
    rng = np.random.RandomState(0)
    tm_small = tm_score(x + rng.randn(*x.shape) * 0.5, x)
    tm_big = tm_score(x + rng.randn(*x.shape) * 6.0, x)
    assert tm_small > 0.7
    assert tm_big < tm_small
    assert 0.0 <= tm_big <= 1.0


def test_tm_score_unrelated_is_low():
    x = make_ca_trace(80, seed=3)
    y = make_ca_trace(80, seed=7)
    assert tm_score(x, y) < 0.45  # random pairs score < 0.5 by convention


def test_tm_score_length_normalization():
    x = make_ca_trace(50, seed=4)
    # fragment alignment: normalize by the longer target -> lower score
    frag = x[:25]
    full = tm_score(frag, frag)
    assert full > 0.999
    partial = tm_score(frag, x)
    assert 0.3 < partial < 0.7  # 25 perfect pairs / d0(50) normalization


def test_d0_formula():
    assert d0_for_length(10) == 0.5
    np.testing.assert_allclose(
        d0_for_length(128), 1.24 * (113) ** (1 / 3) - 1.8, rtol=1e-9
    )


def test_mse_and_length_inference():
    c, n, l = 5, 16, 9
    gt = np.zeros((c, n, n), np.float32)
    sample = gt.copy()
    sample[-1, :l, :l] = 1.0
    assert infer_length_from_padding(sample) == l
    sample2 = sample.copy()
    sample2[0, :l, :l] += 0.5
    # reference averages over ALL channels on the crop; padding-channel ones
    # inside the crop contribute too (sample has 1s there, gt has 0s here)
    want = (0.25 + 1.0) / 5
    assert abs(mse_6d(sample2, gt, l) - want) < 1e-6
    sample2[0, l:, l:] = 99.0  # outside the crop: ignored
    assert abs(mse_6d(sample2, gt, l) - want) < 1e-6
    # geometry-channel restriction
    assert abs(mse_6d(sample2, gt, l, channels=slice(0, 4)) - 0.25 / 4) < 1e-6


def test_tm_score_rigid_transform_is_one_multi_length():
    """Regression for the seed-battery bug: a rigidly transformed copy of a
    compact multi-segment structure must score ~1 at several lengths (the
    old gapless-threading stride skipped offset 0, and refinement from a
    shifted seed got stuck at TM ~0.58)."""
    from text2protein_tpu.data.synthetic import helix_bundle_backbone
    from text2protein_tpu.eval.tmscore import tm_score

    rng = np.random.RandomState(0)
    for L in (24, 48, 65, 100):
        ca = helix_bundle_backbone(L, seed=L)[:, 1]
        # random rotation + translation + tiny noise
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        ca2 = ca @ q.T + rng.randn(3) * 10 + rng.randn(*ca.shape) * 0.1
        tm = tm_score(ca2, ca)
        assert tm > 0.95, (L, tm)


def test_tm_score_shifted_fragment():
    """A structure equal to a window of another must align at high TM with
    the correct offset (exercises non-zero-offset threading seeds)."""
    from text2protein_tpu.data.synthetic import helix_bundle_backbone
    from text2protein_tpu.eval.tmscore import tm_score

    ca = helix_bundle_backbone(80, seed=7)[:, 1]
    frag = ca[25:70]
    tm = tm_score(frag, frag)  # self
    assert tm > 0.99
    # fragment vs full, normalized by fragment length
    tm2 = tm_score(ca, frag, l_target=len(frag))
    assert tm2 > 0.9, tm2


def _bb_from_ca(ca):
    """Fake (L,3,3) N/CA/C backbone around a CA trace for PDB writing."""
    bb = np.zeros((len(ca), 3, 3), np.float32)
    bb[:, 1] = ca
    bb[:, 0] = ca + np.array([-1.2, 0.3, 0.0])
    bb[:, 2] = ca + np.array([1.2, -0.3, 0.0])
    return bb


def test_tm_sweeps_cli_modes(tmp_path):
    """The runnable sweep surface (reference tm/TMalign.py:243-245 role):
    gt mode buckets same-stem pairs, novelty mode sweeps all-vs-all, reu
    mode aggregates score.txt yamls."""
    import json
    import yaml

    from text2protein_tpu.data.pdbio import write_backbone_pdb
    from text2protein_tpu.eval.tm_sweeps import main as sweeps_main

    ddir, rdir = tmp_path / "designed", tmp_path / "refs"
    ddir.mkdir(), rdir.mkdir()
    ca = make_ca_trace(40, seed=1)
    write_backbone_pdb(ddir / "x.pdb", _bb_from_ca(ca))
    q, t = random_rt(3)
    write_backbone_pdb(rdir / "x.pdb", _bb_from_ca(ca @ q.T + t))
    # second design in the realization CLI's real layout:
    # <out_root>/<pdb_id>/rosetta_<pdb_id>.pdb paired with refs/<pdb_id>.pdb
    ca2 = make_ca_trace(36, seed=2)
    (ddir / "y").mkdir()
    write_backbone_pdb(ddir / "y" / "rosetta_y.pdb", _bb_from_ca(ca2))
    q2, t2 = random_rt(4)
    write_backbone_pdb(rdir / "y.pdb", _bb_from_ca(ca2 @ q2.T + t2))

    out = tmp_path / "gt.json"
    assert sweeps_main(["--mode", "gt", "--designed", str(ddir),
                        "--refs", str(rdir), "--out", str(out)]) == 0
    rep = json.loads(out.read_text())
    assert rep["gt50"] == 2 and rep["tm_avg"] > 0.95  # rigid transforms

    out2 = tmp_path / "nov.json"
    assert sweeps_main(["--mode", "novelty", "--designed", str(ddir),
                        "--refs", str(rdir), "--out", str(out2)]) == 0
    assert json.loads(out2.read_text())["target_count"] == 2

    sdir = tmp_path / "ros" / "d1" / "round_1"
    sdir.mkdir(parents=True)
    (sdir / "score.txt").write_text(yaml.safe_dump(
        {"avg_score_per_res": 1.5, "total_energy": 60.0}))
    out3 = tmp_path / "reu.json"
    assert sweeps_main(["--mode", "reu", "--designed", str(tmp_path / "ros"),
                        "--out", str(out3)]) == 0
    rep3 = json.loads(out3.read_text())
    assert rep3 == {"count": 1, "avg": 1.5, "min": 1.5, "max": 1.5, "std": 0.0}


def test_coords_compare_cli(tmp_path):
    """python -m ...eval.coords_compare writes the reference's aggregate
    yaml (coords_compare.py:56-59 naming)."""
    import pickle

    import yaml

    from text2protein_tpu.data.dataset import save_record
    from text2protein_tpu.eval.coords_compare import main as cc_main

    gt_dir = tmp_path / "gt"
    s_dir = tmp_path / "samples"
    gt_dir.mkdir(), s_dir.mkdir()
    rng = np.random.RandomState(0)
    c6d = rng.uniform(-1, 1, (5, 8, 8)).astype(np.float32)
    rec = {
        "id": "recA", "coords": np.zeros((8, 3, 3), np.float32),
        "coords_6d": c6d, "aa": np.zeros(8, np.int64), "aa_str": "A" * 8,
        "mask_pair": np.ones((8, 8), bool), "ss_indices": "", "caption": "",
    }
    save_record(rec, gt_dir / "recA.npz")
    with open(s_dir / "sampled_recA.pkl", "wb") as f:
        pickle.dump(c6d + 0.1, f)

    assert cc_main([str(s_dir), str(gt_dir)]) == 0
    out = yaml.safe_load((tmp_path / "coords_6d_losses.yaml").read_text())
    assert out["count"] == 1
    np.testing.assert_allclose(out["avg"], 0.01, rtol=1e-5)


def test_count_helices_tracks_ground_truth():
    """`count_helices` (the text-contrast eval's detector) recovers the
    generator's helix count from GT 6D maps across lengths and counts.
    Mirrors scripts/eval_text_contrast.py step 1 at unit scale."""
    from text2protein_tpu.data.featurize import featurize_structure
    from text2protein_tpu.data.synthetic import helix_bundle_backbones
    from text2protein_tpu.eval.helix_count import count_helices, helix_fraction

    hits = total = 0
    for L, nh, seed in [(64, 2, 0), (80, 3, 1), (96, 3, 2), (112, 4, 3),
                        (128, 4, 4), (128, 5, 5)]:
        bb = helix_bundle_backbones(L, [seed], n_helices=nh)[0]
        c6d, _, _ = featurize_structure(bb, np.ones(L, bool),
                                        ss_constraints=False)
        total += 1
        hits += int(count_helices(c6d, L) == nh)
        # helix-bundle GT maps are overwhelmingly helical at i,i+4
        assert helix_fraction(c6d, L) > 0.5
    assert hits >= total - 1, f"only {hits}/{total} exact helix counts"
