"""End-to-end quality validation on real hardware.

Builds a synthetic helix-bundle dataset, trains the flagship architecture at
reduced size for a few hundred steps, samples with the PC sampler, and
reports: loss trajectory, sampled-map statistics vs data statistics, 6D MSE,
and backbone realization TM-scores. Writes validation_report.json.

Usage: python scripts/validate_e2e.py [--steps 400] [--n 32] [--nf 32]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synth_records(num, n_max, rng):
    """Synthetic helix bundles with ideal covalent geometry (torsion-space
    construction, so the theta/phi orientation channels are self-consistent
    — see data/synthetic.py)."""
    from text2protein_tpu.data.synthetic import helix_bundle_dataset

    return helix_bundle_dataset(num, n_max, seed=int(rng.randint(1 << 30)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--nf", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--num_records", type=int, default=128)
    p.add_argument("--sample_steps", type=int, default=500)
    p.add_argument("--norm_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--out", type=str, default="validation_report.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_sampling_fn
    from text2protein_tpu.models import build_model
    from text2protein_tpu.text import HashTextEncoder
    from text2protein_tpu.training import create_train_state, make_train_step
    from text2protein_tpu.conditioning import length_mask

    config = load_config({
        "training": {"sde": "vesde", "batch_size": args.batch},
        "data": {"min_res_num": 16, "max_res_num": args.n, "num_channels": 5},
        "model": {
            "condition": ["length"], "nf": args.nf, "ch_mult": [1, 2, 2],
            "num_res_blocks": 2, "attn_resolutions": [args.n // 4],
            "n_heads": 4, "context_dim": 64, "dropout": 0.1,
            "dtype": "bfloat16", "norm_dtype": args.norm_dtype,
        },
        "optim": {"warmup": 100},
        "text": {"encoder": "hash", "max_tokens": 8, "pad_to_bucket": 8},
        "seed": 0,
    })

    rng_np = np.random.RandomState(0)
    print("building synthetic dataset...")
    records = synth_records(args.num_records, args.n, rng_np)

    encoder = HashTextEncoder(dim=64, max_tokens=8, pad_to_bucket=8)
    emb, emb_mask = encoder.encode(["alpha helix bundle protein"] * args.batch)
    emb, emb_mask = jnp.asarray(emb), jnp.asarray(emb_mask)

    def make_device_batch(rng):
        idx = rng.randint(0, len(records), args.batch)
        n = args.n
        coords = np.zeros((args.batch, n, n, 5), np.float32)
        masks = np.zeros((args.batch, n, n), bool)
        lengths = np.zeros(args.batch, np.int32)
        for bi, i in enumerate(idx):
            r = records[i]
            L = r["L"]
            coords[bi, :L, :L] = r["coords_6d"].transpose(1, 2, 0)
            masks[bi, :L, :L] = r["mask_pair"]
            lengths[bi] = L
        return {
            "coords_6d": jnp.asarray(coords),
            "mask_pair": jnp.asarray(masks),
            "ss_spans": jnp.full((args.batch, 4, 2), -1, jnp.int32),
            "length": jnp.asarray(lengths),
            "context": emb,
            "context_mask": emb_mask,
        }

    sde, eps = get_sde(config)
    model = build_model(config)
    batch0 = make_device_batch(rng_np)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch0)
    train_step = make_train_step(config, sde, model, donate=False)

    print("training...")
    rng = jax.random.PRNGKey(1)
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        rng, k = jax.random.split(rng)
        state, loss = train_step(state, make_device_batch(rng_np), k)
        losses.append(float(loss))
        if step % 50 == 0:
            print(f"  step {step}: loss {np.mean(losses[-25:]):.4f}")
    train_time = time.time() - t0

    loss_first = float(np.mean(losses[:20]))
    loss_last = float(np.mean(losses[-20:]))

    # --- sample with a fixed length condition
    print("sampling...")
    n = args.n
    Lc = args.n - 4
    cond = {"length": length_mask(jnp.full((args.batch,), Lc, jnp.int32), n)}
    sampling_fn = get_sampling_fn(
        config, sde, model, (args.batch, n, n, 5), eps,
        num_steps=args.sample_steps,
    )
    sample, nfe = sampling_fn(state.ema.params, jax.random.PRNGKey(2),
                              condition=cond, context=emb, context_mask=emb_mask)
    sample = np.asarray(sample)

    # --- stats vs data distribution on the real crop
    data_vals = np.concatenate(
        [r["coords_6d"][0][r["mask_pair"]].ravel() for r in records[:32]]
    )
    sample_vals = sample[:, :Lc, :Lc, 0].ravel()
    stats = {
        "data_dist_mean": float(data_vals.mean()),
        "data_dist_std": float(data_vals.std()),
        "sample_dist_mean": float(sample_vals.mean()),
        "sample_dist_std": float(sample_vals.std()),
        "sample_in_range_frac": float(
            ((sample_vals >= -1.3) & (sample_vals <= 1.3)).mean()
        ),
    }

    # --- realization of 2 samples + TM score vs nearest training record
    print("realizing...")
    from text2protein_tpu.realize.minimize import realize_6d_sample
    from text2protein_tpu.eval.tmscore import tm_score

    tms = []
    for i in range(2):
        cnn = np.array(sample[i].transpose(2, 0, 1))
        cnn[-1] = np.round(np.clip(cnn[-1], 0, 1))
        try:
            bb, e, _ = realize_6d_sample(cnn, n_restarts=3, max_iter=80,
                                         use_fastrelax=False)
            best = max(
                tm_score(bb[:, 1], r["bb"][: r['L'], 1]) for r in records[:16]
            )
            tms.append(float(best))
        except Exception as exc:
            print(f"  realization {i} failed: {exc}")

    report = {
        "loss_first20": loss_first,
        "loss_last20": loss_last,
        "loss_reduction": loss_first / max(loss_last, 1e-9),
        "train_steps": args.steps,
        "train_time_s": round(train_time, 1),
        "nfe": int(nfe),
        "sample_stats": stats,
        "realized_tm_vs_train": tms,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    ok = loss_last < loss_first and stats["sample_in_range_frac"] > 0.5
    print("VALIDATION", "PASS" if ok else "WEAK")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
