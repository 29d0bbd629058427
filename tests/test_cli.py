"""End-to-end CLI workflow: prepare_dataset -> train -> sampling_6d ->
sampling_rosetta, on synthetic data with a tiny config (the reference's full
user journey, SURVEY.md §3)."""

import pickle
from pathlib import Path

import numpy as np
import pytest
import yaml

from test_pipeline import ideal_helix_backbone  # reuse synthetic PDB maker


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """PDB tree + captions + tiny config on disk."""
    import json

    from text2protein_tpu.data.pdbio import write_backbone_pdb

    root = tmp_path_factory.mktemp("ws")
    pdbs = root / "pdbs"
    pdbs.mkdir()
    rng = np.random.RandomState(0)
    captions = []
    for i in range(8):
        L = int(rng.randint(8, 17))
        bb = ideal_helix_backbone(L, seed=i)
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), size=L))
        write_backbone_pdb(pdbs / f"prot{i}.pdb", bb, seq=seq)
        captions.append({"pdb_id": f"prot{i}", "caption": f"synthetic helix {i}"})
    (root / "captions.json").write_text(json.dumps(captions))

    config = {
        "training": {"sde": "vesde", "batch_size": 2, "n_iters": 6,
                      "epochs": 2, "log_freq": 2, "snapshot_sampling": False},
        "data": {
            "dataset_path": str(pdbs),
            "caption_path": str(root / "captions.json"),
            "processed_dataset_path": str(root / "processed"),
            "min_res_num": 4, "max_res_num": 16, "num_channels": 5,
        },
        "model": {"condition": ["length"], "nf": 8, "ch_mult": [1, 2],
                   "num_res_blocks": 1, "attn_resolutions": [8], "n_heads": 2,
                   "context_dim": 16, "num_scales": 8, "dropout": 0.0},
        "optim": {"warmup": 2},
        "text": {"encoder": "hash", "max_tokens": 8, "pad_to_bucket": 8},
        "seed": 0,
    }
    cfg_path = root / "tiny.yml"
    cfg_path.write_text(yaml.safe_dump(config))
    return root, cfg_path


@pytest.fixture(scope="module")
def trained(workspace):
    """prepare_dataset + a 6-step training run, shared by the CLI tests."""
    root, cfg_path = workspace
    from text2protein_tpu.cli.prepare_dataset import main as prepare_main
    from text2protein_tpu.cli.train import main as train_main

    n = prepare_main([str(cfg_path), "--num_workers", "1"])
    assert n >= 6
    workdir = train_main([str(cfg_path), "--workdir_root", str(root / "training")])
    return workdir


def test_full_cli_workflow(workspace, trained, monkeypatch):
    root, cfg_path = workspace
    monkeypatch.chdir(root)
    workdir = trained
    from text2protein_tpu.cli.train import main as train_main

    assert (workdir / "checkpoints-meta" / "checkpoint").exists()
    assert (workdir / "checkpoints" / "best_train").exists()
    assert (workdir / "train_ids.txt").exists()
    assert (workdir / "test_ids.txt").exists()
    assert (workdir / "tb" / "metrics.jsonl").read_text().count("training_loss") > 0

    # ---- resume from the preemption checkpoint
    workdir2 = train_main([str(cfg_path), "--resume", str(workdir),
                           "--max_steps", "8"])
    assert workdir2 == workdir

    # ---- resume a workdir whose meta checkpoint never landed (killed
    # before the first preemption save): falls back to a best checkpoint
    # instead of restarting from step 0
    import shutil

    workdir_nb = workdir.parent / "no_meta"
    shutil.copytree(workdir, workdir_nb)
    shutil.rmtree(workdir_nb / "checkpoints-meta")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        train_main([str(cfg_path), "--resume", str(workdir_nb),
                    "--max_steps", "8"])
    assert "resumed from a best checkpoint" in buf.getvalue()

    # ---- sampling_6d from best_eval
    from text2protein_tpu.cli.sampling_6d import main as sample_main

    ckpt = workdir / "checkpoints" / "best_eval"
    out_dir = sample_main([
        str(cfg_path), str(ckpt), "--batch_size", "2", "--num_steps", "4",
        "--processed_dir", str(root / "processed"), "--tag", "smoke",
        "--select_length", "--length_index", "9",  # condition on L=12
    ])
    pkls = sorted(out_dir.glob("sampled_*.pkl"))
    assert pkls, "no samples written"
    with open(pkls[0], "rb") as f:
        sample = pickle.load(f)
    assert sample.shape[1] == 5 and sample.shape[2] == 16  # (1, C, N, N)

    # ---- sampling_rosetta (realization) on the sampled maps
    from text2protein_tpu.cli.sampling_rosetta import main as rosetta_main

    rc = rosetta_main([
        str(cfg_path), "--coords_path", str(out_dir), "--n_iter", "1",
        "--n_restarts", "2", "--max_iter", "20",
        "--out_root", str(root / "rosetta"),
    ])
    assert rc == 0
    final_pdbs = list((root / "rosetta").rglob("structure_before_design.pdb"))
    assert final_pdbs, "no realized structures"
    score_files = list((root / "rosetta").rglob("score.txt"))
    assert score_files
    with open(score_files[0]) as f:
        scores = yaml.safe_load(f)
    assert "avg_score_per_res" in scores

    # ---- sampling_rosetta --fastdesign: sequence design + score split
    # (`/root/reference/rosetta_min/run.py:156-178`,
    # `sampling_rosetta.py:125-152` artifact set)
    rc = rosetta_main([
        str(cfg_path), "--coords_path", str(out_dir), "--n_iter", "1",
        "--n_restarts", "2", "--max_iter", "20",
        "--out_root", str(root / "rosetta_fd"), "--fastdesign",
    ])
    assert rc == 0
    after = list((root / "rosetta_fd").rglob("structure_after_design.pdb"))
    assert after, "no designed structures"
    with open(list((root / "rosetta_fd").rglob("score.txt"))[0]) as f:
        fd_scores = yaml.safe_load(f)
    assert len(fd_scores["designed_seq"]) == 12
    assert fd_scores["design_score_after"] <= fd_scores["design_score_before"] + 1e-6
    assert "cart_energy" in fd_scores
    # the designed PDB carries the designed residue identities
    from text2protein_tpu.data.pdbio import read_pdb
    from text2protein_tpu.data.vocab import THREE_TO_ONE

    res = read_pdb(after[0]).amino_residues()
    assert "".join(THREE_TO_ONE[r.name] for r in res) == fd_scores["designed_seq"]
    # the rosetta_<id>.pdb alias must carry the DESIGNED sequence too (with
    # --fastdesign the after-design structure wins over final_structure.pdb,
    # which run_minimization writes with the pre-design poly-A placeholder)
    alias = list((root / "rosetta_fd").rglob("rosetta_*.pdb"))
    assert alias, "no final-structure alias"
    ares = read_pdb(alias[0]).amino_residues()
    assert "".join(THREE_TO_ONE[r.name] for r in ares) == \
        fd_scores["designed_seq"]

    # ---- coords_compare on the samples vs ground truth
    from text2protein_tpu.eval.coords_compare import coord_compare

    stats = coord_compare(out_dir, root / "processed",
                          out_path=root / "mse.yml")
    assert stats["count"] >= 1 and np.isfinite(stats["avg"])


def test_pdb_mask_conditioning_cli(workspace, trained, monkeypatch):
    """sampling_6d --pdb/--chain/--mask_info: conditions from a real PDB file
    must clamp the unmasked region of the sample bit-exactly to the PDB's
    featurized 6D maps (`/root/reference/sampling_6d.py:41-53` flag set,
    `utils.py:122-137` condition construction)."""
    import yaml as _yaml

    root, cfg_path = workspace
    monkeypatch.chdir(root)

    # condition config variant: length + inpainting (same architecture, so
    # the checkpoint trained under ["length"] restores unchanged)
    cfg = _yaml.safe_load(cfg_path.read_text())
    cfg["model"]["condition"] = ["length", "inpainting"]
    cfg2 = root / "tiny_inpaint.yml"
    cfg2.write_text(_yaml.safe_dump(cfg))

    L = 12
    bb = ideal_helix_backbone(L, seed=99)
    from text2protein_tpu.data.pdbio import write_backbone_pdb

    pdb_path = root / "cond_src.pdb"
    seq = "A" * L
    write_backbone_pdb(pdb_path, bb, seq=seq, chain="A")

    from text2protein_tpu.cli.sampling_6d import main as sample_main

    ckpt = trained / "checkpoints" / "best_eval"
    mask_info = "3:6"
    out_dir = sample_main([
        str(cfg2), str(ckpt), "--batch_size", "2", "--num_steps", "4",
        "--processed_dir", str(root / "processed"), "--tag", "pdbcond",
        "--pdb", str(pdb_path), "--chain", "A", "--mask_info", mask_info,
    ])
    pkls = sorted(out_dir.glob("sampled_*.pkl"))
    assert pkls, "no samples written"

    # expected clamp values: the same condition the CLI built
    from text2protein_tpu.config import load_config
    from text2protein_tpu.conditioning import get_conditions_from_pdb
    import pickle as _pickle

    config = load_config(str(cfg2))
    cond = get_conditions_from_pdb(
        str(pdb_path), config, "A", mask_info, batch_size=2)
    coords = np.asarray(cond["inpainting"]["coords_6d"][0])      # (N, N, C)
    inp = np.asarray(cond["inpainting"]["mask_inpaint"][0])      # (N, N)

    with open(pkls[0], "rb") as f:
        sample = _pickle.load(f)[0].transpose(1, 2, 0)           # -> (N, N, C)

    length_sq = np.zeros(sample.shape[:2], bool)
    length_sq[:L, :L] = True
    clamped = length_sq & ~inp
    free = length_sq & inp
    assert clamped.any() and free.any()
    # clamped region equals the PDB's featurized maps exactly
    np.testing.assert_array_equal(sample[clamped], coords[clamped])
    # inpainted region actually evolved away from the (zero-initialised) prior
    assert np.abs(sample[free][:, :4]).mean() > 1e-3
    # mutually exclusive flags rejected, like the reference
    with pytest.raises(AssertionError):
        sample_main([str(cfg2), str(ckpt), "--pdb", str(pdb_path),
                     "--select_length"])


def test_quality_loop_smoke(workspace, trained, monkeypatch, tmp_path):
    """scripts/quality_loop.py end-to-end on the tiny workdir: restore ->
    sample -> 6D MSE -> realize (managed retries) -> TM sweeps -> report.
    This script is the round-end evidence path (reports/quality_*.json);
    a regression here silently costs a full eval run on hardware."""
    import json
    import runpy
    import sys

    root, cfg_path = workspace
    monkeypatch.chdir(root)
    out = tmp_path / "q.json"
    argv = [
        "quality_loop.py", "--workdir", str(trained),
        "--processed", str(root / "processed"),
        "--num_designs", "2", "--batch", "2", "--steps", "4",
        "--restarts", "1", "--max_iter", "5", "--max_train_refs", "2",
        "--out", str(out),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    runpy.run_path(str(Path(__file__).parents[1] / "scripts" / "quality_loop.py"),
                   run_name="__main__")
    rep = json.loads(out.read_text())
    assert rep["num_designs"] == 2 and rep["nfe"] == 8
    assert np.isfinite(rep["mse_6d"]["avg"])
    for k in ("tm_avg", "gt50", "lt30"):
        assert k in rep["tm_gt"]
    assert np.isfinite(rep["tm_novelty_vs_train"]["tm_avg"])
    assert rep["realization_energy"]["flagged_high_energy"] <= 2
    # per-stage artifacts persist for post-mortem assembly
    assert (trained / "quality" / "tm-scores-gt.json").exists()


def test_cli_sampler_hybrid(workspace, trained, monkeypatch):
    """The deployment sampler through the CLI: --sampler hybrid overrides
    sampling.method, phase lengths come from the config's hybrid_* keys
    (num_steps is ignored by design), and the sampled maps keep the CLI's
    (B, C, N, N) pickle contract."""
    root, cfg_path = workspace
    monkeypatch.chdir(root)
    import yaml

    cfg = yaml.safe_load(cfg_path.read_text())
    cfg.setdefault("sampling", {}).update(
        hybrid_ode_steps=4, hybrid_pc_steps=6, hybrid_sigma_cross=2.0)
    cfg2 = root / "tiny_hybrid.yml"
    cfg2.write_text(yaml.safe_dump(cfg))

    from text2protein_tpu.cli.sampling_6d import main as sample_main

    ckpt = trained / "checkpoints" / "best_eval"
    out_dir = sample_main([
        str(cfg2), str(ckpt), "--batch_size", "2", "--sampler", "hybrid",
        "--processed_dir", str(root / "processed"), "--tag", "hybrid",
    ])
    pkls = sorted(out_dir.glob("sampled_*.pkl"))
    assert pkls, "no samples written"
    with open(pkls[0], "rb") as f:
        sample = pickle.load(f)
    assert sample.shape[1] == 5 and sample.shape[2] == 16
    assert np.isfinite(sample).all()


def test_serve_cli(workspace, trained, monkeypatch):
    """cli.serve: start the HTTP server on a random port against the tiny
    trained checkpoint, hit /healthz and /v1/sample (two concurrent requests
    so the micro-batcher exercises its fill-the-batch path, plus one
    realized request), and check the 6D payload round-trips."""
    import base64
    import io
    import json as _json
    import threading
    import urllib.request

    root, cfg_path = workspace
    monkeypatch.chdir(root)
    ckpt = trained / "checkpoints" / "best_eval"

    from text2protein_tpu.cli.serve import _Server, build_parser, main

    args = build_parser().parse_args(
        [str(cfg_path), str(ckpt), "--batch_size", "2", "--num_steps", "4",
         "--port", "0", "--realize", "--max_wait_ms", "200"]
    )
    # build through main() so the wiring (handler injection, warmup path)
    # is what production runs; port 0 => ephemeral
    import text2protein_tpu.cli.serve as serve_mod

    server_obj = _Server(args)
    handler = type("H", (serve_mod._Handler,), {"server_obj": server_obj})
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = _json.loads(r.read())
        assert health["status"] == "ok"
        assert health["max_res_num"] == 16

        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/sample",
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return _json.loads(r.read())

        # two concurrent requests -> one batched dispatch of the B=2 graph
        results = [None, None]

        def worker(i, L):
            results[i] = post({"caption": f"helix {i}", "length": L})

        threads = [threading.Thread(target=worker, args=(i, L))
                   for i, L in enumerate((12, 10))]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for i, L in enumerate((12, 10)):
            z = np.load(io.BytesIO(
                base64.b64decode(results[i]["coords_6d_b64"])))
            cnn = z["coords_6d"]
            assert cnn.shape == (5, 16, 16)
            # the length condition clamps the padding channel to [:L, :L]
            assert float(cnn[-1][:L, :L].mean()) == 1.0
            assert float(cnn[-1][L:, L:].sum()) == 0.0
            assert np.isfinite(cnn).all()
            assert results[i]["nfe"] == 8

        # an explicit seed is reproducible regardless of co-batched traffic
        a = post({"caption": "helix", "length": 12, "seed": 7})
        bth = threading.Thread(
            target=lambda: post({"caption": "noise", "length": 9}))
        bth.start()
        b2 = post({"caption": "helix", "length": 12, "seed": 7})
        bth.join()
        assert a["coords_6d_b64"] == b2["coords_6d_b64"]

        # realized request returns a PDB with L residues
        out = post({"caption": "x", "length": 8, "realize": True})
        assert "pdb" in out and out["pdb"].count(" CA ") == 8
        assert np.isfinite(out["energy"])

        # validation error path
        try:
            post({"length": 9999})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
