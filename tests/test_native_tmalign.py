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


def _first_tm(out: str) -> float:
    for line in out.split("\n"):
        if line.startswith("TM-score="):
            return float(line.replace("=", " ").split()[1])
    raise AssertionError(f"no TM-score line in:\n{out}")


@pytest.fixture(scope="module")
def reference_binary(tmp_path_factory):
    """The reference repo's prebuilt Zhang-lab TMalign (read-only tree, no
    exec bit — copy to tmp). Skip when absent or not runnable here."""
    import shutil

    src = Path("/root/reference/tm/TMalign")
    if not src.exists():
        pytest.skip("reference TMalign binary not present")
    dst = tmp_path_factory.mktemp("refbin") / "TMalign"
    shutil.copy(src, dst)
    dst.chmod(0o755)
    probe = subprocess.run([str(dst)], capture_output=True)
    if b"TM-align" not in probe.stdout + probe.stderr:
        pytest.skip("reference TMalign binary not runnable")
    return dst


def _own_alignment(out: str):
    """Gapped (seq1, seq2) from our binary's alignment block — the exact
    input the reference's -I (fixed-alignment) mode consumes."""
    lines = out.splitlines()
    for idx, line in enumerate(lines):
        if line.startswith('(":"'):
            return lines[idx + 1], lines[idx + 3]
    raise AssertionError("no alignment block in output")


def test_pinned_to_reference_binary(binary, reference_binary, tmp_path):
    """Score agreement with the reference's own binary
    (`/root/reference/tm/TMalign.cpp`), VERDICT r2 weak #4 tightened:

    * related pairs: within 2% both sides;
    * unrelated pairs: never materially worse (own >= ref - 5%), and any
      score above ref + 5% must be CERTIFIED by the reference itself — its
      -I mode rescoring our alignment must reproduce our number within 3%
      (proving the excess is a genuinely better alignment under the
      reference's own metric, not overcounting).
    """
    from text2protein_tpu.data.pdbio import write_backbone_pdb

    rng = np.random.RandomState(7)
    pairs = []
    # related pairs (noised rigid transforms of the same trace)
    for i, (l1, noise) in enumerate([(60, 0.5), (80, 3.0)]):
        bb1 = make_trace(l1, i)
        bb2 = bb1 + rng.randn(l1, 1, 3) * noise
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        bb2 = bb2 @ q.T + rng.randn(3) * 15
        p1, p2 = tmp_path / f"r{i}_1.pdb", tmp_path / f"r{i}_2.pdb"
        write_backbone_pdb(p1, bb1)
        write_backbone_pdb(p2, bb2)
        pairs.append((p1, p2, True))
    # unrelated pairs across a length battery
    for i, (l1, l2) in enumerate([
        (60, 60), (80, 60), (100, 80), (70, 70), (120, 90),
        (64, 128), (90, 90), (50, 110), (75, 85), (128, 128),
    ]):
        bb1, bb2 = make_trace(l1, 100 + i), make_trace(l2, 200 + i)
        p1, p2 = tmp_path / f"u{i}_1.pdb", tmp_path / f"u{i}_2.pdb"
        write_backbone_pdb(p1, bb1)
        write_backbone_pdb(p2, bb2)
        pairs.append((p1, p2, False))

    for p1, p2, related in pairs:
        ref = _first_tm(subprocess.run(
            [str(reference_binary), str(p1), str(p2)], capture_output=True
        ).stdout.decode())
        out_own = subprocess.run(
            [str(binary), str(p1), str(p2)], capture_output=True
        ).stdout.decode()
        own = _first_tm(out_own)
        rel = (own - ref) / ref
        if related:
            assert abs(rel) < 0.02, f"{p1.name}: ref={ref} own={own}"
            continue
        assert rel > -0.05, f"{p1.name}: ref={ref} own={own} (worse search)"
        if rel > 0.05:
            s1, s2 = _own_alignment(out_own)
            fa = tmp_path / f"{p1.stem}.fasta"
            fa.write_text(f">c1\n{s1}\n>c2\n{s2}\n")
            cert = _first_tm(subprocess.run(
                [str(reference_binary), str(p1), str(p2), "-I", str(fa)],
                capture_output=True,
            ).stdout.decode())
            assert abs(own - cert) / cert < 0.03, (
                f"{p1.name}: own={own} not certified by ref -I ({cert})"
            )


def test_mmcif_input(binary, pdbs, tmp_path):
    """mmCIF _atom_site parsing: same structure in PDB and mmCIF must align
    to TM ~= 1 (reference reads mmCIF, `/root/reference/tm/TMalign.cpp:397`)."""
    rows = []
    for line in (pdbs / "a.pdb").read_text().splitlines():
        if not line.startswith("ATOM"):
            continue
        rows.append(
            f"ATOM {len(rows) + 1} {line[12:16].strip()} {line[17:20]} A "
            f"{line[22:26].strip()} {line[30:38].strip()} "
            f"{line[38:46].strip()} {line[46:54].strip()} 1"
        )
    cif = tmp_path / "a.cif"
    cif.write_text(
        "data_test\n#\nloop_\n_atom_site.group_PDB\n_atom_site.id\n"
        "_atom_site.label_atom_id\n_atom_site.label_comp_id\n"
        "_atom_site.auth_asym_id\n_atom_site.auth_seq_id\n_atom_site.Cartn_x\n"
        "_atom_site.Cartn_y\n_atom_site.Cartn_z\n_atom_site.pdbx_PDB_model_num\n"
        + "\n".join(rows) + "\n#\n"
    )
    out = subprocess.run(
        [str(binary), str(cif), str(pdbs / "b.pdb")], capture_output=True
    ).stdout.decode()
    assert _first_tm(out) > 0.999


def test_rotation_matrix_output(binary, pdbs, tmp_path):
    """-m dumps the chain1->chain2 superposition in the reference format."""
    mat = tmp_path / "m.txt"
    subprocess.run(
        [str(binary), str(pdbs / "a.pdb"), str(pdbs / "b.pdb"), "-m", str(mat)],
        capture_output=True, check=True,
    )
    lines = mat.read_text().splitlines()
    vals = np.array([[float(v) for v in l.split()[1:]] for l in lines[2:5]])
    t, u = vals[:, 0], vals[:, 1:]
    assert np.allclose(u @ u.T, np.eye(3), atol=1e-6)
    # applying (u, t) to chain-1 CAs must reproduce chain 2 (rigid pair)
    from text2protein_tpu.eval.tmscore import ca_from_pdb

    ca1, ca2 = ca_from_pdb(pdbs / "a.pdb"), ca_from_pdb(pdbs / "b.pdb")
    rmsd = np.sqrt(((ca1 @ u.T + t - ca2) ** 2).sum(-1).mean())
    assert rmsd < 0.05


def test_seq_id_reported(binary, pdbs):
    out = subprocess.run(
        [str(binary), str(pdbs / "a.pdb"), str(pdbs / "b.pdb")],
        capture_output=True,
    ).stdout.decode()
    assert "Seq_ID=n_identical/n_aligned=" in out
