"""CFG quality-cost sweep (VERDICT r3 #8): steering vs structural quality.

`reports/quality_text_cfg.json` showed caption exact-match 75.8% at
cfg_scale 2.0 but carried no TM or realization numbers — guidance could in
principle buy match-rate by pushing samples off the data manifold. This
sweep samples the SAME matched-caption batches at cfg_scale in {1, 1.5, 2,
3} and reports, per scale: caption exact-match fraction, 6D MSE vs the
matched GT, realized TM-vs-GT buckets, and realization energy stats.

Reference context: the CFG convention being swept is the reference's
`w*model(x, ctx) + (1-w)*model(x, 0*ctx)`
(`/root/reference/sampler/diffusion_sampler.py:125-128`), wired into the PC
chain here (diffusion/sampling.py cfg_scale; NFE doubles for scale > 1).

Usage:
  python scripts/eval_cfg_sweep.py --workdir training/quality_text/<stamp>
      [--scales 1,1.5,2,3] [--batch 16] [--length 128] [--steps 1000]
      [--out reports/quality_text_cfg_sweep.json]
"""

import argparse
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_caption(caption: str):
    m = re.search(r"with (\d+) helices and (\d+) residues", caption)
    return (int(m.group(1)), int(m.group(2))) if m else (None, None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--processed", type=str, default=None)
    p.add_argument("--scales", type=str, default="1,1.5,2,3")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--length", type=int, default=128)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--restarts", type=int, default=2)
    p.add_argument("--max_iter", type=int, default=200)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str,
                   default="reports/quality_text_cfg_sweep.json")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.conditioning import length_mask
    from text2protein_tpu.data import load_record
    from text2protein_tpu.data.pdbio import write_backbone_pdb
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_pc_sampler, pick_chunk
    from text2protein_tpu.eval.coords_compare import mse_6d
    from text2protein_tpu.eval.helix_count import count_helices
    from text2protein_tpu.eval.tm_sweeps import gt_gen_tm_compare
    from text2protein_tpu.models import build_model
    from text2protein_tpu.realize.minimize import realize_batch_managed
    from text2protein_tpu.text import build_text_encoder
    from text2protein_tpu.training import restore_ema_params

    workdir = Path(args.workdir)
    config = load_config(str(workdir / "config.yml"))
    processed = Path(args.processed or config.data.processed_dataset_path)
    n = config.data.max_res_num
    c = config.data.num_channels
    bs = args.batch
    L = args.length
    scales = [float(x) for x in args.scales.split(",") if x.strip()]
    assert scales, f"--scales parsed to nothing: {args.scales!r}"

    # matched-caption test records at the target length
    test_ids = [x.strip()
                for x in (workdir / "test_ids.txt").read_text().splitlines()
                if x.strip()]
    records = []
    for tid in test_ids:
        path = processed / f"{tid}.npz"
        if not path.exists():
            continue
        rec = load_record(path)
        n_hel, cap_len = parse_caption(rec.get("caption", ""))
        if n_hel is None or int(rec["coords"].shape[0]) != L:
            continue
        rec["id"], rec["n_hel"] = tid, n_hel
        records.append(rec)
    assert len(records) >= 4, f"only {len(records)} L={L} test records"
    recs = [records[i % len(records)] for i in range(bs)]

    sde, eps = get_sde(config)
    model = build_model(config)
    encoder = build_text_encoder(config)
    emb, emb_mask = encoder.encode([r["caption"] for r in recs])
    init_batch = {
        "coords_6d": jnp.zeros((bs, n, n, c), jnp.float32),
        "mask_pair": jnp.zeros((bs, n, n), bool),
        "ss_spans": jnp.full((bs, 32, 2), -1, jnp.int32),
        "length": jnp.full((bs,), L, jnp.int32),
        "context": jnp.asarray(emb),
        "context_mask": jnp.asarray(emb_mask),
    }
    params, step_trained = restore_ema_params(
        workdir, config, model, init_batch, checkpoint=args.checkpoint
    )
    print(f"restored step {step_trained}")

    lengths = jnp.asarray([L] * bs, jnp.int32)
    cond = {"length": length_mask(lengths, n)}
    qdir = workdir / "cfg_sweep"
    rows = []
    for scale in scales:
        sampler = get_pc_sampler(
            sde, model, (bs, n, n, c),
            predictor=config.sampling.predictor,
            corrector=config.sampling.corrector,
            snr=config.sampling.snr,
            n_steps=config.sampling.n_steps_each,
            denoise=config.sampling.noise_removal,
            eps=eps, num_steps=args.steps,
            chunk_size=pick_chunk(args.steps, 500),
            cfg_scale=scale,
        )
        t0 = time.time()
        sample, nfe = sampler(
            params, jax.random.PRNGKey(args.seed), condition=cond,
            context=jnp.asarray(emb), context_mask=jnp.asarray(emb_mask),
        )
        sample = np.asarray(sample)
        t_sample = time.time() - t0
        print(f"scale {scale}: sampled {bs} (nfe {int(nfe)}, "
              f"{t_sample:.0f}s)")

        cnns = np.stack([s.transpose(2, 0, 1) for s in sample])
        msk = np.zeros((n, n), np.float32)
        msk[:L, :L] = 1.0
        cnns[:, -1] = msk

        matches, mses = [], []
        for j, rec in enumerate(recs):
            det = count_helices(cnns[j], L)
            matches.append(int(det == rec["n_hel"]))
            gt = np.zeros((c, n, n), np.float32)
            gt[:, :L, :L] = rec["coords_6d"][:, :L, :L]
            mses.append(mse_6d(cnns[j], gt, L))

        t1 = time.time()
        bbs, es, flags = realize_batch_managed(
            cnns, n_restarts=args.restarts, max_iter=args.max_iter,
            seed=args.seed,
        )
        ddir = qdir / f"scale_{scale}"
        gdir = qdir / "gt"
        ddir.mkdir(parents=True, exist_ok=True)
        gdir.mkdir(parents=True, exist_ok=True)
        pairs = []
        for j, rec in enumerate(recs):
            name = f"s{scale}_d{j:02d}_{rec['id']}"
            dpath = ddir / f"{name}.pdb"
            gpath = gdir / f"gt_{rec['id']}.pdb"
            write_backbone_pdb(dpath, bbs[j])
            if not gpath.exists():
                write_backbone_pdb(gpath, rec["coords"])
            pairs.append((name, dpath, gpath))
        sweep = gt_gen_tm_compare(
            pairs, out_path=ddir / "tm-scores.json")
        rows.append({
            "cfg_scale": scale,
            "nfe": int(nfe),
            "exact_match_frac": round(float(np.mean(matches)), 4),
            "mse_6d_avg": round(float(np.mean(mses)), 4),
            "tm": {k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in sweep.items() if k != "samples"},
            "energy_mean": round(float(np.mean(es)), 2),
            "energy_median": round(float(np.median(es)), 2),
            "realize_flagged": int(np.sum(flags)),
            "sample_time_s": round(t_sample, 1),
            "realize_time_s": round(time.time() - t1, 1),
        })
        print(json.dumps(rows[-1]))

        # write incrementally: a round-end kill mid-sweep keeps every
        # completed scale's evidence on disk
        report = {
            "workdir": str(workdir),
            "trained_steps": step_trained,
            "batch": bs,
            "length": L,
            "pc_steps": args.steps,
            "scales_requested": scales,
            "per_scale": rows,
            "platform": jax.devices()[0].platform,
        }
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as f:
            json.dump(report, f, indent=2)

    print(json.dumps({k: v for k, v in report.items() if k != "per_scale"},
                     indent=2))


if __name__ == "__main__":
    main()
