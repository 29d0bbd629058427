"""Auxiliary components: DDIM sampler, inpainting API, MPNN export, dataset
checker, text encoders, normalization zoo, TM sweeps."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from helpers import tiny_config, tiny_batch


def test_ddim_sampler_and_loss():
    from text2protein_tpu.diffusion.ddim import DDIMSampler, make_beta_schedule
    from text2protein_tpu.models import build_model

    config = tiny_config()
    config.model.scale_by_sigma = False  # epsilon-pred family
    model = build_model(config)
    batch = tiny_batch(config)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["coords_6d"],
        jnp.zeros((2,)), context=batch["context"],
        context_mask=batch["context_mask"],
    )["params"]

    sampler = DDIMSampler(model, n_timestep=100)
    loss = sampler.p_loss(
        params, batch["coords_6d"], jax.random.PRNGKey(1),
        context=batch["context"], context_mask=batch["context_mask"],
    )
    assert np.isfinite(float(loss))
    l1 = sampler.p_loss(params, batch["coords_6d"], jax.random.PRNGKey(1),
                        loss_type="l1")
    assert np.isfinite(float(l1))

    out = sampler.sample(
        params, jax.random.PRNGKey(2), (2, 16, 16, 5),
        context=batch["context"], context_mask=batch["context_mask"],
        ddim_steps=5, w=1.5, eta=0.0,
    )
    assert out.shape == (2, 16, 16, 5)
    assert np.isfinite(np.asarray(out)).all()
    # same key + eta=0 -> fully deterministic
    out2 = sampler.sample(
        params, jax.random.PRNGKey(2), (2, 16, 16, 5),
        context=batch["context"], context_mask=batch["context_mask"],
        ddim_steps=5, w=1.5, eta=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_cfg_formula():
    """eps = w * cond + (1 - w) * uncond(zeroed context)."""
    from text2protein_tpu.diffusion.ddim import DDIMSampler

    class StubModel:
        def apply(self, variables, x, t, context=None, context_mask=None,
                  train=False, rngs=None):
            return x + jnp.sum(context) if context is not None else x

    sampler = DDIMSampler(StubModel(), n_timestep=10)
    x = jnp.ones((2, 4, 4, 1))
    ctx = jnp.full((2, 3, 2), 0.5)
    t = jnp.zeros((2,), jnp.int32)
    cond = np.asarray(sampler._eps({}, x, t, ctx, None, w=1.0))
    uncond = np.asarray(sampler._eps({}, x, t, jnp.zeros_like(ctx), None, w=1.0))
    guided = np.asarray(sampler._eps({}, x, t, ctx, None, w=2.0))
    np.testing.assert_allclose(guided, 2.0 * cond - 1.0 * uncond, rtol=1e-6)


def test_beta_schedules():
    from text2protein_tpu.diffusion.ddim import make_beta_schedule

    for s in ("linear", "cosine", "sqrt_linear", "sqrt"):
        b = make_beta_schedule(s, 100)
        assert b.shape == (100,)
        assert np.all(b >= 0) and np.all(b < 1)


def test_pc_inpainter_clamps_known_region():
    from text2protein_tpu.diffusion.inpainting import get_pc_inpainter
    from text2protein_tpu.diffusion.sde import VESDE

    class FakeModel:
        def apply(self, variables, x, labels, context=None, context_mask=None,
                  train=False, rngs=None):
            return -x / 4.0

    sde = VESDE(N=20, sigma_min=0.01, sigma_max=10.0)
    b, n, c = 2, 8, 5
    inpainter = get_pc_inpainter(sde, FakeModel(), (b, n, n, c))
    coords = jnp.full((b, n, n, c), 0.7)
    mask = jnp.zeros((b, n, n), bool).at[:, :4, :4].set(True)
    out, nfe = inpainter({}, jax.random.PRNGKey(0), coords, mask)
    out = np.asarray(out)
    # known (False) region exactly preserved
    assert np.all(out[:, 5:, 5:, :] == 0.7)
    # inpainted region actually generated
    assert np.abs(out[:, :4, :4, :] - 0.7).max() > 1e-3


def test_mpnn_export(tmp_path):
    from text2protein_tpu.data.pdbio import write_backbone_pdb
    from text2protein_tpu.eval.mpnn_export import export_mpnn_jsonl

    rng = np.random.RandomState(0)
    d = tmp_path / "designs" / "round_1"
    d.mkdir(parents=True)
    for i in range(3):
        L = 10 + i
        ca = np.cumsum(rng.randn(L, 3) * 2, axis=0)
        bb = np.stack([ca - [1.4, 0, 0], ca, ca + [1.5, 0, 0],
                       ca + [0.6, 1.0, 0]], axis=1)
        write_backbone_pdb(d / f"design{i}.pdb", bb, seq="A" * L)
    out = tmp_path / "mpnn.jsonl"
    n = export_mpnn_jsonl(tmp_path / "designs", out)
    assert n == 3
    lines = out.read_text().splitlines()
    rec = json.loads(lines[0])
    assert rec["num_of_chains"] == 1
    assert "seq_chain_A" in rec and "coords_chain_A" in rec
    assert len(rec["coords_chain_A"]["CA_chain_A"]) == len(rec["seq"])


def test_checker_and_backfill(tmp_path):
    from text2protein_tpu.data.checker import (
        compare_pdb_file_and_caption, backfill_captions, batch_smoke_check,
    )
    from text2protein_tpu.data.dataset import save_record

    pdbs = tmp_path / "pdbs"
    pdbs.mkdir()
    for pid in ("1abc", "2def"):
        (pdbs / f"{pid}.pdb").write_text("END\n")
    cap = tmp_path / "cap.json"
    cap.write_text(json.dumps([{"pdb_id": "1abc", "caption": "a protein"},
                               {"pdb_id": "9zzz", "caption": "missing"}]))
    rep = compare_pdb_file_and_caption(pdbs, cap)
    assert rep["num_both"] == 1 and rep["num_pdbs"] == 2

    proc = tmp_path / "proc"
    proc.mkdir()
    L = 6
    rec = {
        "id": "1abc", "coords": np.zeros((L, 3, 3), np.float32),
        "coords_6d": np.zeros((5, L, L), np.float32),
        "aa": np.zeros(L, np.int64), "aa_str": "A" * L,
        "mask_pair": np.ones((L, L), bool), "ss_indices": "", "caption": "",
    }
    save_record(rec, proc / "1abc.npz")
    assert backfill_captions(proc, cap) == 1
    from text2protein_tpu.data.dataset import load_record

    assert load_record(proc / "1abc.npz")["caption"] == "a protein"
    smoke = batch_smoke_check(proc, max_len=8, batch_size=1)
    assert smoke["finite"] and smoke["coords_6d"] == [1, 5, 8, 8]


def test_hash_text_encoder_deterministic():
    from text2protein_tpu.text import HashTextEncoder

    enc = HashTextEncoder(dim=32, max_tokens=16, pad_to_bucket=8, seed=1)
    e1, m1 = enc.encode(["hello world", "protein structure generation"])
    e2, m2 = enc.encode(["hello world", "protein structure generation"])
    np.testing.assert_array_equal(e1, e2)
    assert e1.shape[0] == 2 and e1.shape[2] == 32
    assert e1.shape[1] % 8 == 0
    assert m1[0].sum() == 2 and m1[1].sum() == 3
    # same token -> same embedding row
    e3, _ = enc.encode(["hello hello"])
    np.testing.assert_array_equal(e3[0, 0], e3[0, 1])


def test_caption_cache_roundtrip(tmp_path):
    from text2protein_tpu.text import HashTextEncoder, CachedTextEncoder, encode_captions

    enc = HashTextEncoder(dim=16, max_tokens=8, pad_to_bucket=4)
    path = tmp_path / "id2emb.npz"
    encode_captions({"1abc": "some caption", "2def": "another longer caption here"},
                    enc, path)
    cache = CachedTextEncoder(path, pad_to_bucket=4, max_tokens=8)
    emb, mask = cache.encode_ids(["1abc", "2def"])
    assert emb.shape[0] == 2 and emb.shape[2] == 16
    want, _ = enc.encode(["some caption"])
    np.testing.assert_allclose(emb[0, :2], want[0, :2], atol=1e-6)


def test_normalization_zoo():
    import jax

    from text2protein_tpu.models.normalization import get_normalization

    x = jnp.ones((2, 8, 8, 16)) + jax.random.normal(
        jax.random.PRNGKey(0), (2, 8, 8, 16)
    )
    for name in ("GroupNorm", "InstanceNorm++", "InstanceNorm", "VarianceNorm"):
        mod = get_normalization(name)(16)
        params = mod.init(jax.random.PRNGKey(1), x)
        out = mod.apply(params, x)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()


def test_tm_sweeps(tmp_path):
    from text2protein_tpu.data.pdbio import write_backbone_pdb
    from text2protein_tpu.eval.tm_sweeps import gt_gen_tm_compare, reu_stats

    rng = np.random.RandomState(0)
    pairs = []
    for i in range(2):
        L = 30
        steps = rng.randn(L, 3)
        steps /= np.linalg.norm(steps, axis=1, keepdims=True)
        ca = np.cumsum(3.8 * steps, axis=0)
        bb = np.stack([ca - [1.4, 0, 0], ca, ca + [1.5, 0, 0]], axis=1)
        gt = tmp_path / f"gt{i}.pdb"
        dg = tmp_path / f"designed{i}.pdb"
        write_backbone_pdb(gt, bb)
        write_backbone_pdb(dg, bb + rng.randn(3) * 5)  # rigid shift: TM=1
        pairs.append((f"p{i}", dg, gt))
    out = gt_gen_tm_compare(pairs, out_path=tmp_path / "tm-scores.json",
                            use_native=False, num_workers=1)
    assert out["gt50"] == 2 and out["tm_avg"] > 0.99

    import yaml

    s = tmp_path / "score.txt"
    s.write_text(yaml.safe_dump({"avg_score_per_res": -1.5}))
    stats = reu_stats([s])
    assert stats["count"] == 1 and stats["avg"] == -1.5


def test_esm_prep(tmp_path):
    from text2protein_tpu.data.pdbio import write_backbone_pdb
    from text2protein_tpu.eval.esm_prep import load_coords, contact_map

    rng = np.random.RandomState(0)
    L = 12
    ca = np.cumsum(rng.randn(L, 3) * 2, axis=0)
    bb = np.stack([ca - [1.4, 0, 0], ca, ca + [1.5, 0, 0]], axis=1)
    p = tmp_path / "x.pdb"
    write_backbone_pdb(p, bb, seq="ACDEFGHIKLMN")
    coords, seq = load_coords(p, chain="A")
    assert coords.shape == (L, 3, 3)
    assert seq == "ACDEFGHIKLMN"
    cm = contact_map(coords)
    assert cm.shape == (L, L)
    assert cm.diagonal().all()  # self-contacts at d=0


def test_show_all_channels(tmp_path):
    from text2protein_tpu.utils.plotting import show_all_channels

    sample = [np.random.rand(5, 8, 8)]
    out = tmp_path / "channels.png"
    show_all_channels(sample, path=out, nrows=1, ncols=5)
    assert out.exists() and out.stat().st_size > 0


def test_train_gen_tm_compare(tmp_path):
    from text2protein_tpu.data.pdbio import write_backbone_pdb
    from text2protein_tpu.eval.tm_sweeps import train_gen_tm_compare

    rng = np.random.RandomState(0)

    def trace(seed):
        steps = rng.randn(40, 3)
        steps /= np.linalg.norm(steps, axis=1, keepdims=True)
        ca = np.cumsum(3.8 * steps, axis=0)
        return np.stack([ca - [1.4, 0, 0], ca, ca + [1.5, 0, 0]], axis=1)

    train_paths = []
    for i in range(3):
        p = tmp_path / f"train{i}.pdb"
        write_backbone_pdb(p, trace(i))
        train_paths.append(p)
    d = tmp_path / "designs" / "x" / "round_1"
    d.mkdir(parents=True)
    designed = d / "final_structure.pdb"
    write_backbone_pdb(designed, trace(99))

    out = train_gen_tm_compare(
        [designed], train_paths, out_path=tmp_path / "tm-scores.json",
        use_native=False, num_workers=1,
    )
    assert out["target_count"] == 1 and out["reference_count"] == 3
    assert len(out["samples"]) == 1
    s = next(iter(out["samples"].values()))
    assert 0.0 <= s["sample_min"] <= s["sample_avg"] <= s["sample_max"] <= 1.0
    assert (tmp_path / "tm-scores.json").exists()


def test_assemble_curve(tmp_path):
    """scripts/assemble_curve.py: eval milestones + resume-gap-robust
    throughput from a MetricsWriter JSONL stream."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).parents[1] / "scripts"))
    from assemble_curve import assemble

    wd = tmp_path / "wd"
    (wd / "tb").mkdir(parents=True)
    (wd / "config.yml").write_text("training:\n  batch_size: 4\n")
    rows = []
    t = 1000.0
    # two contiguous stretches separated by a 2-hour outage gap (which must
    # not count toward throughput)
    for step in range(50, 501, 50):
        rows.append({"tag": "training_loss", "value": 1.0 / step,
                     "step": step, "time": t})
        t += 50.0  # 1 step/s
    t += 7200.0
    for step in range(550, 1001, 50):
        rows.append({"tag": "training_loss", "value": 1.0 / step,
                     "step": step, "time": t})
        t += 50.0
    rows.append({"tag": "avg_eval_loss", "value": 0.125, "step": 1000,
                 "time": t})
    with open(wd / "tb" / "metrics.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    rep = assemble(wd)
    assert rep["steps_completed"] == 1000
    # 4 samples/step at 1 step/s; the 2 h gap and the cross-gap step delta
    # are excluded
    assert abs(rep["throughput_samples_per_sec"] - 4.0) < 0.01
    assert rep["eval_curve"] == [{"step": 1000, "avg_eval_loss": 0.125}]
    assert rep["final_training_loss"] == 0.001
