"""Caption-contrast eval: does text measurably steer sampled structure?

The round-2 gap (VERDICT r2 #1): every trained run used captions perfectly
correlated with length, so nothing could show the model reads them. This
driver closes it on a checkpoint trained on the DECORRELATED corpus
(`scripts/make_synth_dataset.py --decorrelate_helices`):

  1. Detector validation: run the map-based helix counter
     (`eval/helix_count.py`) over ground-truth corpus maps and report its
     exact-match accuracy against each record's captioned helix count. The
     contrast metric is only meaningful if this is high.
  2. Caption contrast: at fixed lengths, sample batches under captions naming
     each valid helix count (same RNG, same length condition — ONLY the
     caption differs) and report the detected-count distribution per caption.
  3. Swapped-caption control: 6D MSE of each sample against (a) a GT record
     whose (L, helix count) matches its caption vs (b) one with a different
     count at the same L — matched should be systematically lower.

Reference context being matched: the text path of
`/root/reference/train.py:108-112` + `score_sde_pytorch/losses.py:96-103`
(captions -> cross-attention context), which the reference never evaluates
for steering either.

Usage:
  python scripts/eval_text_contrast.py --workdir training/quality_text/<stamp>
      [--lengths 96,128] [--batch 16] [--steps 1000]
      [--out reports/quality_text.json]
"""

import argparse
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def caption_for(n_hel: int, L: int) -> str:
    """Must match scripts/make_synth_dataset.py's caption template."""
    return (f"synthetic alpha helical bundle protein with {n_hel} "
            f"helices and {L} residues")


def parse_caption(caption: str):
    m = re.search(r"with (\d+) helices and (\d+) residues", caption)
    return (int(m.group(1)), int(m.group(2))) if m else (None, None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--processed", type=str, default=None)
    p.add_argument("--lengths", type=str, default="96,128")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str, default="reports/quality_text.json")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg_scale", type=float, default=1.0,
                   help="classifier-free guidance scale (needs a model "
                        "trained with model.context_dropout > 0)")
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
    from text2protein_tpu.data import ProteinProcessedDataset, load_record
    from text2protein_tpu.data.synthetic import valid_helix_counts
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_sampling_fn, pick_chunk
    from text2protein_tpu.eval.coords_compare import mse_6d
    from text2protein_tpu.eval.helix_count import count_helices
    from text2protein_tpu.models import build_model
    from text2protein_tpu.text import build_text_encoder
    from text2protein_tpu.training import restore_ema_params

    workdir = Path(args.workdir)
    config = load_config(str(workdir / "config.yml"))
    processed = Path(args.processed or config.data.processed_dataset_path)
    n = config.data.max_res_num
    c = config.data.num_channels
    bs = args.batch
    lengths = [int(x) for x in args.lengths.split(",")]

    # ---- 1. detector validation on ground-truth maps -----------------------
    dataset = ProteinProcessedDataset(str(processed))
    gt_by_key = {}  # (L, n_hel) -> list of GT (C, N, N) maps
    n_match = n_total = 0
    det_by_true = {}
    for path in dataset.data_paths:
        rec = load_record(processed / path)
        n_hel, L = parse_caption(rec.get("caption", ""))
        if n_hel is None:
            continue
        det = count_helices(rec["coords_6d"], L)
        n_match += int(det == n_hel)
        n_total += 1
        det_by_true.setdefault(n_hel, []).append(det)
        gt = np.zeros((c, n, n), np.float32)
        gt[:, :L, :L] = rec["coords_6d"][:, :L, :L]
        gt_by_key.setdefault((L, n_hel), []).append(gt)
    det_acc = n_match / max(n_total, 1)
    print(f"detector exact-match on {n_total} GT maps: {det_acc:.3f}")
    for k in sorted(det_by_true):
        v = np.asarray(det_by_true[k])
        print(f"  true {k}: detected mean {v.mean():.2f} "
              f"exact {np.mean(v == k):.2f} (n={len(v)})")

    # ---- restore checkpoint ------------------------------------------------
    sde, eps = get_sde(config)
    model = build_model(config)
    encoder = build_text_encoder(config)
    emb0, emb_mask0 = encoder.encode([caption_for(3, lengths[0])] * bs)
    init_batch = {
        "coords_6d": jnp.zeros((bs, n, n, c), jnp.float32),
        "mask_pair": jnp.zeros((bs, n, n), bool),
        "ss_spans": jnp.full((bs, 32, 2), -1, jnp.int32),
        "length": jnp.full((bs,), lengths[0], jnp.int32),
        "context": jnp.asarray(emb0),
        "context_mask": jnp.asarray(emb_mask0),
    }
    params, step_trained = restore_ema_params(
        workdir, config, model, init_batch, checkpoint=args.checkpoint
    )
    print(f"restored checkpoint at step {step_trained}")

    config.sampling.cfg_scale = args.cfg_scale
    sampler = get_sampling_fn(
        config, sde, model, (bs, n, n, c), eps,
        num_steps=args.steps, chunk_size=pick_chunk(args.steps, 500),
    )

    # ---- 2. caption contrast ----------------------------------------------
    contrast = []
    t0 = time.time()
    for L in lengths:
        counts = valid_helix_counts(L)
        cond = {"length": length_mask(jnp.full((bs,), L, jnp.int32), n)}
        for n_hel in counts:
            emb, emb_mask = encoder.encode([caption_for(n_hel, L)] * bs)
            # same key per (L) group: only the caption differs across n_hel
            key = jax.random.PRNGKey(args.seed + 7919 * L)
            sample, _ = sampler(
                params, key, condition=cond,
                context=jnp.asarray(emb), context_mask=jnp.asarray(emb_mask),
            )
            sample = np.asarray(sample).transpose(0, 3, 1, 2)  # (B, C, N, N)
            det = [count_helices(s, L) for s in sample]

            # ---- 3. swapped-caption control per sample ----
            mse_match, mse_mism = [], []
            for s in sample:
                refs = gt_by_key.get((L, n_hel), [])
                others = [g for (l2, h2), gs in gt_by_key.items()
                          if l2 == L and h2 != n_hel for g in gs]
                if refs:
                    mse_match.append(
                        min(mse_6d(s, g, L) for g in refs))
                if others:
                    mse_mism.append(
                        min(mse_6d(s, g, L) for g in others))
            row = {
                "L": L,
                "caption_helices": n_hel,
                "detected_mean": float(np.mean(det)),
                "detected_std": float(np.std(det)),
                "detected_counts": {
                    str(k): int(np.sum(np.asarray(det) == k))
                    for k in sorted(set(det))
                },
                "exact_match_frac": float(np.mean(np.asarray(det) == n_hel)),
                "mse_vs_matched_gt": (
                    float(np.mean(mse_match)) if mse_match else None),
                "mse_vs_mismatched_gt": (
                    float(np.mean(mse_mism)) if mse_mism else None),
            }
            contrast.append(row)
            print(f"L={L} caption={n_hel} helices -> detected "
                  f"{row['detected_mean']:.2f}±{row['detected_std']:.2f} "
                  f"exact {row['exact_match_frac']:.2f} "
                  f"mse match/mism "
                  f"{row['mse_vs_matched_gt']}/{row['mse_vs_mismatched_gt']} "
                  f"({time.time() - t0:.0f}s)")

    # ---- summary stats -----------------------------------------------------
    caps = np.asarray([r["caption_helices"] for r in contrast], float)
    dets = np.asarray([r["detected_mean"] for r in contrast], float)
    # correlation between captioned and detected counts across groups
    corr = float(np.corrcoef(caps, dets)[0, 1]) if len(caps) > 2 else None
    exact = float(np.mean([r["exact_match_frac"] for r in contrast]))
    m = [r["mse_vs_matched_gt"] for r in contrast
         if r["mse_vs_matched_gt"] is not None
         and r["mse_vs_mismatched_gt"] is not None]
    mm = [r["mse_vs_mismatched_gt"] for r in contrast
          if r["mse_vs_matched_gt"] is not None
          and r["mse_vs_mismatched_gt"] is not None]
    report = {
        "workdir": str(workdir),
        "trained_steps": step_trained,
        "pc_steps": args.steps,
        "batch": bs,
        "cfg_scale": args.cfg_scale,
        "detector_gt_accuracy": round(det_acc, 4),
        "detector_gt_n": n_total,
        "caption_detected_correlation": corr,
        "exact_match_frac_avg": exact,
        "mse_matched_avg": float(np.mean(m)) if m else None,
        "mse_mismatched_avg": float(np.mean(mm)) if mm else None,
        "contrast": contrast,
        "platform": jax.devices()[0].platform,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "contrast"},
                     indent=2))


if __name__ == "__main__":
    main()
