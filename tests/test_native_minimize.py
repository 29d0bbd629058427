"""Native C++ minimizer: build + gradient self-test + structure recovery."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

NATIVE_DIR = Path(__file__).resolve().parents[1] / "native" / "minimize"


@pytest.fixture(scope="module")
def binary():
    b = NATIVE_DIR / "minimize"
    r = subprocess.run(["make", "-C", str(NATIVE_DIR)], capture_output=True)
    if r.returncode != 0 or not b.exists():
        pytest.skip(f"cannot build minimize: {r.stderr.decode()[:200]}")
    return b


def test_gradient_selftest(binary):
    r = subprocess.run([str(binary), "--selftest"], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("PASS") == 6


def test_native_recovers_structure(binary):
    import jax

    from text2protein_tpu.realize.geometry import build_backbone, random_dihedrals
    from text2protein_tpu.realize.restraints import inverse_scale
    from text2protein_tpu.realize.native import run_minimization_native
    from text2protein_tpu.data.featurize import featurize_structure
    from text2protein_tpu.eval.tmscore import tm_score

    L = 24
    phi, psi, om = random_dihedrals(jax.random.PRNGKey(5), L)
    bb_true = np.asarray(build_backbone(phi, psi, om))
    c6d, _, _ = featurize_structure(bb_true, np.ones(L), ss_constraints=False)
    npz = inverse_scale(c6d, L)

    bb_min, e_best = run_minimization_native(
        npz, "A" * L, n_restarts=3, max_iter=100, seed=1
    )
    assert np.isfinite(bb_min).all()
    assert e_best is not None
    tm = tm_score(bb_min[:, 1], bb_true[:, 1])
    assert tm > 0.5, f"TM {tm}, E {e_best}"
