"""Native C++ tmalign tool: build + wrapper contract + score sanity."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

NATIVE_DIR = Path(__file__).resolve().parents[1] / "native" / "tmalign"


@pytest.fixture(scope="module")
def binary():
    b = NATIVE_DIR / "tmalign"
    if not b.exists():
        r = subprocess.run(["make", "-C", str(NATIVE_DIR)], capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build tmalign: {r.stderr.decode()[:200]}")
    return b


def make_trace(L, seed):
    rng = np.random.RandomState(seed)
    steps = rng.randn(L, 3)
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    for i in range(1, L):
        steps[i] = 0.6 * steps[i - 1] + 0.4 * steps[i]
        steps[i] /= np.linalg.norm(steps[i])
    ca = np.cumsum(3.8 * steps, axis=0)
    return np.stack([ca + [1.2, 0.3, 0], ca, ca + [-1.2, -0.3, 0]], axis=1)


@pytest.fixture(scope="module")
def pdbs(tmp_path_factory):
    from text2protein_tpu.data.pdbio import write_backbone_pdb

    d = tmp_path_factory.mktemp("tm")
    bb1 = make_trace(60, 0)
    rng = np.random.RandomState(1)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    bb2 = bb1 @ q.T + rng.randn(3) * 20
    bb3 = make_trace(60, 5)
    for nm, bb in [("a", bb1), ("b", bb2), ("c", bb3)]:
        write_backbone_pdb(d / f"{nm}.pdb", bb)
    return d


def test_rigid_transform_scores_one(binary, pdbs):
    from text2protein_tpu.eval.tmscore import run_tmalign

    tm = run_tmalign(pdbs / "a.pdb", pdbs / "b.pdb", binary_path=binary)
    assert tm > 0.999
    tm_fast = run_tmalign(pdbs / "a.pdb", pdbs / "b.pdb", binary_path=binary,
                          fast=True)
    assert tm_fast > 0.999


def test_unrelated_scores_low(binary, pdbs):
    from text2protein_tpu.eval.tmscore import run_tmalign

    tm = run_tmalign(pdbs / "a.pdb", pdbs / "c.pdb", binary_path=binary)
    assert 0.0 <= tm < 0.45


def test_output_layout_contract(binary, pdbs):
    """The reference wrapper reads a 'TM-score= ' line from stdout
    (`/root/reference/utils.py:150-158`)."""
    out = subprocess.run(
        [str(binary), str(pdbs / "a.pdb"), str(pdbs / "b.pdb")],
        capture_output=True,
    ).stdout.decode()
    lines = out.split("\n")
    assert len(lines) >= 14
    tm_lines = [l for l in lines if l.startswith("TM-score=")]
    assert len(tm_lines) == 2  # chain-1 and chain-2 normalized
    assert float(tm_lines[0].replace("=", " ").split()[1]) > 0.999


def test_python_and_native_agree(binary, pdbs):
    from text2protein_tpu.eval.tmscore import run_tmalign, tm_score_from_pdbs

    native = run_tmalign(pdbs / "a.pdb", pdbs / "c.pdb", binary_path=binary)
    python = tm_score_from_pdbs(pdbs / "a.pdb", pdbs / "c.pdb")
    assert abs(native - python) < 0.15  # same algorithm family, minor seeds diff
