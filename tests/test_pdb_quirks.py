"""Real-world PDB pathology fixtures for the hand-rolled parser (VERDICT r2
weak #5).

Round 2 only ever parsed PDBs written by the repo's own `write_backbone_pdb`.
These fixtures hand-craft the quirks real RCSB files contain — negative
resSeq, insertion codes, TER/chain breaks, mid-chain MSE as HETATM,
truncated lines, altLoc duplicates, waters with weird atoms, multi-model
files — and assert `data/pdbio.read_pdb` + `data/dataset.featurize_pdb_file`
reproduce the skip/extract semantics the reference gets from biotite
(`/root/reference/dataset.py:177-223`).
"""

import gzip

import numpy as np
import pytest


def atom_line(serial, name, res, chain, res_seq, x, y, z, icode=" ",
              altloc=" ", record="ATOM  ", element=None):
    el = element or name[0]
    nm = f" {name:<3s}" if len(name) < 4 else name
    return (f"{record}{serial:5d} {nm}{altloc}{res:>3s} {chain}{res_seq:4d}"
            f"{icode}   {x:8.3f}{y:8.3f}{z:8.3f}{1.00:6.2f}{20.00:6.2f}"
            f"          {el:>2s}")


def helix_backbone(L):
    """Ideal-geometry helix via the package's own NeRF builder."""
    import jax
    import jax.numpy as jnp

    from text2protein_tpu.realize.geometry import build_backbone

    phi = jnp.full((L,), jnp.deg2rad(-61.0))
    psi = jnp.full((L,), jnp.deg2rad(-41.0))
    return np.asarray(build_backbone(phi, psi))


def write_residues(lines, bb, start=0, chain="A", res="ALA", seq_offset=1,
                   serial_start=1, icode=" ", record="ATOM  "):
    serial = serial_start
    for i in range(bb.shape[0]):
        for j, an in enumerate(("N", "CA", "C")):
            x, y, z = bb[i, j]
            lines.append(atom_line(serial, an, res, chain,
                                   start + i + seq_offset, x, y, z,
                                   icode=icode, record=record))
            serial += 1
    return serial


def test_negative_resseq(tmp_path):
    """Negative residue numbers (real files start at e.g. -2) parse and keep
    file order."""
    from text2protein_tpu.data.pdbio import read_pdb

    bb = helix_backbone(6)
    lines = []
    serial = 1
    for i in range(6):
        for j, an in enumerate(("N", "CA", "C")):
            x, y, z = bb[i, j]
            lines.append(atom_line(serial, an, "ALA", "A", i - 3, x, y, z))
            serial += 1
    p = tmp_path / "neg.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    s = read_pdb(p)
    assert [r.res_seq for r in s.residues] == [-3, -2, -1, 0, 1, 2]
    assert len(s.amino_residues()) == 6


def test_insertion_codes_distinct(tmp_path):
    """52, 52A, 52B are three residues (antibody-numbering style)."""
    from text2protein_tpu.data.pdbio import read_pdb

    bb = helix_backbone(3)
    lines = []
    serial = 1
    for i, ic in enumerate((" ", "A", "B")):
        for j, an in enumerate(("N", "CA", "C")):
            x, y, z = bb[i, j]
            lines.append(atom_line(serial, an, "GLY", "A", 52, x, y, z,
                                   icode=ic))
            serial += 1
    p = tmp_path / "icode.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    s = read_pdb(p)
    assert len(s.residues) == 3
    assert [r.icode for r in s.residues] == [" ", "A", "B"]


def test_ter_and_chain_break(tmp_path):
    """TER lines are ignored; chains A and B both parse; the reference's
    get_residues walks ALL chains (`/root/reference/dataset.py:184-186`), so
    featurization sees the concatenated length."""
    from text2protein_tpu.data.dataset import featurize_pdb_file
    from text2protein_tpu.data.pdbio import read_pdb

    bb = helix_backbone(20)
    lines = []
    serial = write_residues(lines, bb[:10], chain="A")
    lines.append("TER")
    write_residues(lines, bb[10:], chain="B", serial_start=serial)
    p = tmp_path / "twochain.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    s = read_pdb(p)
    assert s.chains() == ["A", "B"]
    assert len(s.filter_chain("B").residues) == 10
    rec = featurize_pdb_file(p, 4, 64, ss_constraints=False)
    assert rec is not None and rec["coords"].shape == (20, 3, 3)


def test_mse_hetatm_maps_to_met(tmp_path):
    """Selenomethionine appears mid-chain as HETATM MSE; biotite yields it as
    a residue and the vocab maps it to MET
    (`/root/reference/dataset.py:187-190`)."""
    from text2protein_tpu.data.dataset import featurize_pdb_file

    bb = helix_backbone(8)
    lines = []
    serial = write_residues(lines, bb[:4])
    serial = write_residues(lines, bb[4:5], start=4, res="MSE",
                            serial_start=serial, record="HETATM")
    write_residues(lines, bb[5:], start=5, serial_start=serial)
    p = tmp_path / "mse.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    rec = featurize_pdb_file(p, 4, 64, ss_constraints=False)
    assert rec is not None
    assert rec["aa_str"] == "AAAAMAAA"


def test_truncated_and_garbage_lines(tmp_path):
    """Truncated ATOM lines and junk records are skipped, not fatal."""
    from text2protein_tpu.data.pdbio import read_pdb

    bb = helix_backbone(4)
    lines = ["HEADER    JUNK", "REMARK 350 NOTHING"]
    write_residues(lines, bb)
    lines.insert(5, "ATOM     99  CA AL")      # truncated mid-name
    lines.insert(6, "ATOM    100  CA  ALA A  9")  # no coords
    p = tmp_path / "trunc.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    s = read_pdb(p)
    assert len(s.residues) == 4
    assert all(len(r.atom_names) == 3 for r in s.residues)


def test_altloc_first_kept(tmp_path):
    """A/B altlocs: only the A location is kept, coords from A."""
    from text2protein_tpu.data.pdbio import read_pdb

    bb = helix_backbone(2)
    lines = []
    serial = 1
    for j, an in enumerate(("N", "CA", "C")):
        x, y, z = bb[0, j]
        lines.append(atom_line(serial, an, "SER", "A", 1, x, y, z,
                               altloc="A"))
        serial += 1
        lines.append(atom_line(serial, an, "SER", "A", 1, x + 5, y, z,
                               altloc="B"))
        serial += 1
    p = tmp_path / "altloc.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    s = read_pdb(p)
    assert len(s.residues) == 1
    r = s.residues[0]
    assert len(r.atom_names) == 3
    np.testing.assert_allclose(r.atom("N"), bb[0, 0], atol=1e-3)


def test_waters_and_ligands_excluded(tmp_path):
    """HOH/WAT never count as residues; a CA-carrying ligand maps to UNK."""
    from text2protein_tpu.data.pdbio import read_pdb

    bb = helix_backbone(4)
    lines = []
    serial = write_residues(lines, bb)
    lines.append(atom_line(serial, "O", "HOH", "A", 100, 1, 2, 3,
                           record="HETATM"))
    lines.append(atom_line(serial + 1, "CA", "HOH", "A", 101, 4, 5, 6,
                           record="HETATM", element="CA"))  # calcium ion!
    lines.append(atom_line(serial + 2, "CA", "LIG", "A", 102, 7, 8, 9,
                           record="HETATM", element="C"))
    p = tmp_path / "waters.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    s = read_pdb(p)
    amino = s.amino_residues()
    names = [r.name for r in amino]
    assert "HOH" not in names
    assert names.count("LIG") == 1  # CA-carrying unknown ligand -> UNK


def test_multimodel_skipped(tmp_path):
    """NMR multi-model files are skipped by featurize_pdb_file
    (`/root/reference/dataset.py:180-182`)."""
    from text2protein_tpu.data.dataset import featurize_pdb_file
    from text2protein_tpu.data.pdbio import read_pdb

    bb = helix_backbone(6)
    lines = ["MODEL     1"]
    write_residues(lines, bb)
    lines.append("ENDMDL")
    lines.append("MODEL     2")
    write_residues(lines, bb + 1.0)
    lines.append("ENDMDL")
    p = tmp_path / "nmr.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    assert read_pdb(p).num_models == 2
    assert featurize_pdb_file(p, 4, 64, ss_constraints=False) is None


def test_gzip_roundtrip(tmp_path):
    from text2protein_tpu.data.pdbio import read_pdb

    bb = helix_backbone(5)
    lines = []
    write_residues(lines, bb)
    p = tmp_path / "z.pdb.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines) + "\nEND\n")
    assert len(read_pdb(p).residues) == 5


def test_missing_backbone_atom_rolling_mask(tmp_path):
    """A residue missing CA zeroes itself + neighbors in the rolling mask
    (`/root/reference/dataset.py:204-217`)."""
    from text2protein_tpu.data.dataset import featurize_pdb_file

    bb = helix_backbone(12)
    lines = []
    serial = 1
    for i in range(12):
        for j, an in enumerate(("N", "CA", "C")):
            if i == 5 and an == "CA":
                continue
            x, y, z = bb[i, j]
            lines.append(atom_line(serial, an, "ALA", "A", i + 1, x, y, z))
            serial += 1
    p = tmp_path / "gap.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    rec = featurize_pdb_file(p, 4, 64, ss_constraints=False)
    assert rec is not None
    mp = rec["mask_pair"]
    # masked residues 4,5,6: their pair rows/cols are all False
    for i in (4, 5, 6):
        assert not mp[i].any() and not mp[:, i].any()
    assert mp[3, 7]
