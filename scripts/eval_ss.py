"""SS-conditioned (C=8) + inpainting trained-model evaluation (VERDICT r2 #3).

On a trained `configs/quality_ss.yml` workdir (condition [length, ss,
inpainting], 8 channels), measures:

  (a) SS conditioning. Channels 4:7 are clamped by the sampler, so their
      agreement is asserted bit-exactly (the clamp contract,
      `/root/reference/score_sde_pytorch/sampling.py:260-277`) — the REAL
      test is whether the free geometry channels respect the blocks: within
      the GT helix blocks given as condition, the sampled dist channel's
      near-diagonal helicity (d(i,i+4) < 7.5 A) must be high, and measurably
      higher than under a SHUFFLED-SS control (each record sampled under the
      previous record's SS maps). The control must stay SS-conditioned: a
      [length, ss, inpainting] model sampled without its SS clamp is
      out-of-distribution — the free channels 4:7 random-walk to prior
      scale (~sigma_max) and drag the geometry channels with them, so a
      "length-only" baseline measures divergence, not specificity.
  (b) Inpainting. Mask a contiguous span (25-50%), clamp the rest to a GT
      test record, sample (still SS-conditioned), and compare the
      masked-region 6D MSE vs GT to the same model's SS-conditioned samples
      WITHOUT the inpainting clamp — the GT context around the span must
      pull the generated span measurably closer.
  (c) TM buckets of realized SS-conditioned designs vs their GT records.

Writes one report json (default reports/quality_ss.json).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num_designs", type=int, default=24)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--restarts", type=int, default=5)
    p.add_argument("--max_iter", type=int, default=300)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str, default="reports/quality_ss.json")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); the default "
                        "backend wins otherwise")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.conditioning import length_mask
    from text2protein_tpu.data import load_record
    from text2protein_tpu.data.pdbio import write_backbone_pdb
    from text2protein_tpu.data.ss import parse_ss_spans
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_sampling_fn, pick_chunk
    from text2protein_tpu.eval.helix_count import helix_flags
    from text2protein_tpu.eval.tm_sweeps import gt_gen_tm_compare
    from text2protein_tpu.models import build_model
    from text2protein_tpu.realize.minimize import realize_batch_managed
    from text2protein_tpu.text import build_text_encoder
    from text2protein_tpu.training import restore_ema_params

    workdir = Path(args.workdir)
    config = load_config(str(workdir / "config.yml"))
    processed = Path(config.data.processed_dataset_path)
    n = config.data.max_res_num
    c = config.data.num_channels
    assert c == 8, "eval_ss needs a C=8 (cond_ss) model"
    bs = args.batch

    test_ids = [l.strip()
                for l in (workdir / "test_ids.txt").read_text().splitlines()
                if l.strip()]
    records = []
    for tid in test_ids:
        path = processed / f"{tid}.npz"
        if path.exists():
            rec = load_record(path)
            rec["id"] = tid
            records.append(rec)
    assert records, "no test records"
    print(f"{len(records)} test records")

    # ---- restore ----------------------------------------------------------
    sde, eps = get_sde(config)
    model = build_model(config)
    encoder = build_text_encoder(config)
    rec0 = records[0]
    emb0, emb_mask0 = encoder.encode([rec0.get("caption", "")] * bs)
    init_batch = {
        "coords_6d": jnp.zeros((bs, n, n, c), jnp.float32),
        "mask_pair": jnp.zeros((bs, n, n), bool),
        "ss_spans": jnp.full((bs, 32, 2), -1, jnp.int32),
        "length": jnp.full((bs,), 64, jnp.int32),
        "context": jnp.asarray(emb0),
        "context_mask": jnp.asarray(emb_mask0),
    }
    params, step_trained = restore_ema_params(
        workdir, config, model, init_batch, checkpoint=args.checkpoint
    )
    print(f"restored step {step_trained}")
    sampler = get_sampling_fn(
        config, sde, model, (bs, n, n, c), eps,
        num_steps=args.steps, chunk_size=pick_chunk(args.steps, 500),
    )

    def gt_nhwc(rec):
        L = rec["coords"].shape[0]
        g = np.zeros((n, n, c), np.float32)
        g[:L, :L, :] = rec["coords_6d"][:, :L, :L].transpose(1, 2, 0)
        return g, L

    def sample_batch(recs, condition, key, caption=""):
        emb, emb_mask = encoder.encode(
            [r.get("caption", caption) for r in recs])
        out, _ = sampler(params, key, condition=condition,
                         context=jnp.asarray(emb),
                         context_mask=jnp.asarray(emb_mask))
        return np.asarray(out)  # (B, N, N, C)

    rng = np.random.RandomState(args.seed)
    t0 = time.time()

    # ======================= (a) SS conditioning ===========================
    recs = [records[i % len(records)] for i in range(bs)]
    gts = [gt_nhwc(r) for r in recs]
    lengths = jnp.asarray([L for _, L in gts], jnp.int32)
    ss_cond = jnp.asarray(np.stack([g[..., 4:7] for g, _ in gts]))
    cond_ss = {"length": length_mask(lengths, n), "ss": ss_cond}
    key = jax.random.PRNGKey(args.seed)
    key, k1, k2 = jax.random.split(key, 3)
    samp_ss = sample_batch(recs, cond_ss, k1)
    # clamp contract: channels 4:7 returned bit-equal to the condition
    clamp_ok = bool(np.array_equal(
        samp_ss[..., 4:7], np.asarray(ss_cond)))

    # helicity inside conditioned helix blocks, vs a shuffled-SS control:
    # record j sampled under record j-1's SS maps (still in-distribution for
    # a [length, ss, ...] model — only the block placement is wrong). The
    # rolled maps must be zeroed outside record j's own LxL square: the
    # length clamp zeroes every other channel there, so leaving record
    # j-1's blocks beyond L_j would clamp SS=1 on padding — an
    # out-of-distribution state that would bias the control downward.
    sq = np.zeros((bs, n, n, 1), np.float32)
    for j, (_, L) in enumerate(gts):
        sq[j, :L, :L, 0] = 1.0
    cond_shuf = {"length": length_mask(lengths, n),
                 "ss": jnp.roll(ss_cond, 1, axis=0) * jnp.asarray(sq)}
    samp_len = sample_batch(recs, cond_shuf, k2)

    def block_helicity(sample_nhwc, rec, L):
        cnn = sample_nhwc.transpose(2, 0, 1)
        flags = helix_flags(cnn, L)
        spans = parse_ss_spans(rec.get("ss_indices", ""), 32)
        vals = []
        for s, e in spans:
            if s < 0:
                continue
            for i in range(int(s), min(int(e) - 4, L - 4)):
                vals.append(flags[i])
        return float(np.mean(vals)) if vals else np.nan

    hel_cond, hel_base = [], []
    for j, (rec, (g, L)) in enumerate(zip(recs, gts)):
        hc = block_helicity(samp_ss[j], rec, L)
        hb = block_helicity(samp_len[j], rec, L)
        if np.isfinite(hc) and np.isfinite(hb):
            hel_cond.append(hc)
            hel_base.append(hb)
    print(f"(a) helicity in conditioned blocks {np.mean(hel_cond):.3f} vs "
          f"shuffled-SS control {np.mean(hel_base):.3f} clamp_ok={clamp_ok} "
          f"({time.time() - t0:.0f}s)")

    # ======================= (b) inpainting ================================
    mask_np = np.zeros((bs, n, n), bool)
    spans = []
    for j, (g, L) in enumerate(gts):
        w = int(L * (0.25 + 0.25 * rng.rand()))
        s = rng.randint(0, max(L - w, 1))
        m1 = np.zeros(n, bool)
        m1[s:s + w] = True
        mask_np[j] = m1[:, None] | m1[None, :]
        mask_np[j, L:, :] = False
        mask_np[j, :, L:] = False
        spans.append((s, s + w))
    cond_inp = {
        "length": length_mask(lengths, n),
        "ss": ss_cond,  # the model is [length, ss, inpainting]-conditioned
        "inpainting": {
            "coords_6d": jnp.asarray(np.stack([g for g, _ in gts])),
            "mask_inpaint": jnp.asarray(mask_np),
        },
    }
    key, k3 = jax.random.split(key)
    samp_inp = sample_batch(recs, cond_inp, k3)

    # control: the SS-conditioned samples WITHOUT the inpainting clamp
    mse_masked_inp, mse_masked_unc = [], []
    for j, (g, L) in enumerate(gts):
        m = mask_np[j][:L, :L]
        d_inp = (samp_inp[j][:L, :L, :4] - g[:L, :L, :4]) ** 2
        d_unc = (samp_ss[j][:L, :L, :4] - g[:L, :L, :4]) ** 2
        mse_masked_inp.append(float(d_inp[m].mean()))
        mse_masked_unc.append(float(d_unc[m].mean()))
    print(f"(b) masked-span MSE inpaint {np.mean(mse_masked_inp):.4f} vs "
          f"no-inpaint {np.mean(mse_masked_unc):.4f}")

    # ======================= (c) TM buckets ================================
    qdir = workdir / "quality_ss"
    ddir, gdir = qdir / "designs", qdir / "gt"
    for d in (ddir, gdir):
        d.mkdir(parents=True, exist_ok=True)
    designs = []
    n_batches = -(-args.num_designs // bs)
    for bi in range(n_batches):
        recs_b = [records[(bi * bs + j) % len(records)] for j in range(bs)]
        gts_b = [gt_nhwc(r) for r in recs_b]
        lengths_b = jnp.asarray([L for _, L in gts_b], jnp.int32)
        cond_b = {
            "length": length_mask(lengths_b, n),
            "ss": jnp.asarray(np.stack([g[..., 4:7] for g, _ in gts_b])),
        }
        key, kb = jax.random.split(key)
        out = sample_batch(recs_b, cond_b, kb)
        for j, rec in enumerate(recs_b):
            designs.append((rec, out[j].transpose(2, 0, 1)))
    designs = designs[: args.num_designs]

    by_len = {}
    for i, (rec, cnn) in enumerate(designs):
        by_len.setdefault(int(rec["coords"].shape[0]), []).append(i)
    energies = np.zeros(len(designs))
    n_flagged = 0
    pairs = []
    for L, idxs in sorted(by_len.items()):
        cnns = np.stack([designs[i][1] for i in idxs])
        msk = np.zeros((n, n), np.float32)
        msk[:L, :L] = 1.0
        cnns[:, -1] = msk
        bbs, es, flags = realize_batch_managed(
            cnns, n_restarts=args.restarts, max_iter=args.max_iter,
            seed=args.seed)
        n_flagged += int(flags.sum())
        for k, i in enumerate(idxs):
            rec = designs[i][0]
            name = f"ssdesign_{i:03d}_{rec['id']}"
            dpath, gpath = ddir / f"{name}.pdb", gdir / f"gt_{rec['id']}.pdb"
            write_backbone_pdb(dpath, bbs[k])
            if not gpath.exists():
                write_backbone_pdb(gpath, rec["coords"])
            pairs.append((name, dpath, gpath))
            energies[i] = es[k]
        print(f"(c) realized {len(idxs)} at L={L} ({time.time() - t0:.0f}s)")
    gt_sweep = gt_gen_tm_compare(pairs, out_path=qdir / "tm-scores-gt.json")

    report = {
        "workdir": str(workdir),
        "trained_steps": step_trained,
        "pc_steps": args.steps,
        "ss_clamp_bit_exact": clamp_ok,
        "helicity_in_conditioned_blocks": round(float(np.mean(hel_cond)), 4),
        "helicity_shuffled_ss_control": round(float(np.mean(hel_base)), 4),
        "inpaint_masked_mse": round(float(np.mean(mse_masked_inp)), 5),
        "no_inpaint_masked_mse": round(float(np.mean(mse_masked_unc)), 5),
        "inpaint_mse_ratio": round(
            float(np.mean(mse_masked_inp) / max(np.mean(mse_masked_unc),
                                                1e-9)), 4),
        "tm_gt": {k: gt_sweep[k]
                  for k in ("tm_avg", "tm_std", "tm_min", "tm_max",
                            "gt50", "gt40", "gt30", "lt30")},
        "realization_energy": {
            "avg": float(np.mean(energies)),
            "median": float(np.median(energies)),
            "max": float(np.max(energies)),
            "flagged_high_energy": n_flagged,
        },
        "num_designs": len(designs),
        "platform": jax.devices()[0].platform,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
