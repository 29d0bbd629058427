"""SS block-placement SPECIFICITY eval for a trained C=8 (cond_ss) model.

`scripts/eval_ss.py`'s arm (a) contrasts helicity inside GT helix blocks
against a shuffled-SS control — but on the all-helix synthetic corpus the
neighbouring records' blocks overlap so heavily that the control saturates
(measured 0.985 vs 0.898: no signal). This eval decouples specificity from
corpus homogeneity with two placement-sensitive measurements on the SAME
trained model:

  (1) in-vs-out: sample under each record's TRUE SS maps; helicity INSIDE
      the conditioned helix blocks must far exceed helicity in the loop
      gaps OUTSIDE every block. Flags are d(i, i+4) windows, so arms are
      classified by the WHOLE window: inside = all 5 residues in a span,
      outside = window clear of the 2-dilated spans (position-only
      selection let near-block windows read block geometry and inflated
      the outside arm — the round-3 negative margin).
  (2) shifted blocks: rebuild the SS channels with every block moved +8
      residues (rows/cols of the pair maps shifted together, no wrap) and
      sample under the SHIFTED condition. If the model reads block
      placement, helicity inside the shifted spans stays high while the
      vacated positions (inside a GT span but outside every shifted span)
      drop toward loop levels.

Reference context: the SS channels are the P-SEA block pair-maps of
`/root/reference/dataset.py:114-168` (here `data/ss.get_coarse_constraints`);
the sampler clamp contract is `score_sde_pytorch/sampling.py:260-277`.

Writes reports/quality_ss_spec.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SHIFT = 8
W = 5  # helix flags are d(i, i+4) windows over residues [i, i+4]


def window_all(m, nf, w=W):
    """Flags whose whole w-residue window lies inside mask `m`."""
    out = np.ones(nf, bool)
    for o in range(w):
        out &= m[o:o + nf]
    return out


def window_any(m, nf, w=W):
    """Flags whose window touches mask `m` anywhere."""
    out = np.zeros(nf, bool)
    for o in range(w):
        out |= m[o:o + nf]
    return out


def dilate(m, r=2):
    return np.convolve(m.astype(int), np.ones(2 * r + 1, int), "same") > 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--batch", type=int, default=16,
                   help="designs per sampled batch (B=32 at L=128 nf=128 "
                        "crashed the TPU worker once — reach larger n via "
                        "--rounds, not batch)")
    p.add_argument("--rounds", type=int, default=2,
                   help="sampling rounds; total designs = batch * rounds")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str, default="reports/quality_ss_spec.json")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); the default "
                        "backend wins otherwise")
    p.add_argument("--param_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="cast the restored EMA params to this storage dtype "
                        "before sampling (bench.py --param_dtype's quality "
                        "counterpart: same metric, halved HBM weight traffic)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.conditioning import length_mask
    from text2protein_tpu.data import load_record
    from text2protein_tpu.data.ss import parse_ss_spans
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_sampling_fn, pick_chunk
    from text2protein_tpu.eval.helix_count import helix_flags
    from text2protein_tpu.models import build_model
    from text2protein_tpu.text import build_text_encoder
    from text2protein_tpu.training import restore_ema_params

    workdir = Path(args.workdir)
    config = load_config(str(workdir / "config.yml"))
    processed = Path(config.data.processed_dataset_path)
    n = config.data.max_res_num
    c = config.data.num_channels
    assert c == 8, "needs a C=8 (cond_ss) model"
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

    sde, eps = get_sde(config)
    model = build_model(config)
    encoder = build_text_encoder(config)
    emb0, emb_mask0 = encoder.encode([""] * bs)
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
    if args.param_dtype == "bfloat16":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
    sampler = get_sampling_fn(
        config, sde, model, (bs, n, n, c), eps,
        num_steps=args.steps, chunk_size=pick_chunk(args.steps, 500),
    )

    key = jax.random.PRNGKey(args.seed)
    rounds_data = []
    for rnd in range(args.rounds):
        recs = [records[(rnd * bs + i) % len(records)] for i in range(bs)]
        gts, lengths_np, spans_all = [], [], []
        for r in recs:
            L = r["coords"].shape[0]
            g = np.zeros((n, n, c), np.float32)
            g[:L, :L, :] = r["coords_6d"][:, :L, :L].transpose(1, 2, 0)
            gts.append(g)
            lengths_np.append(L)
            sp = parse_ss_spans(r.get("ss_indices", ""), 32)
            spans_all.append([(int(s), int(e)) for s, e in sp if s >= 0])
        lengths = jnp.asarray(lengths_np, jnp.int32)
        ss_true = np.stack([g[..., 4:7] for g in gts])

        # shifted SS maps: every block +SHIFT residues, rows/cols together
        ss_shift = np.zeros_like(ss_true)
        for j, L in enumerate(lengths_np):
            ss_shift[j, SHIFT:L, SHIFT:L] = (
                ss_true[j, : L - SHIFT, : L - SHIFT])
        spans_shift = [
            [(s + SHIFT, min(e + SHIFT, L)) for s, e in sp
             if s + SHIFT < L - 4 and min(e + SHIFT, L) - (s + SHIFT) >= 5]
            for sp, L in zip(spans_all, lengths_np)
        ]

        def sample_batch(ss_maps, k):
            emb, emb_mask = encoder.encode(
                [r.get("caption", "") for r in recs])
            cond = {"length": length_mask(lengths, n),
                    "ss": jnp.asarray(ss_maps)}
            out, _ = sampler(params, k, condition=cond,
                             context=jnp.asarray(emb),
                             context_mask=jnp.asarray(emb_mask))
            return np.asarray(out)

        key, k1, k2 = jax.random.split(key, 3)
        t0 = time.time()
        samp_true = sample_batch(ss_true, k1)
        samp_shift = sample_batch(ss_shift, k2)
        print(f"round {rnd}: sampled 2x{bs} in {time.time() - t0:.0f}s")
        rounds_data.append(
            (samp_true, samp_shift, lengths_np, spans_all, spans_shift))

    def flags_of(sample_nhwc, L):
        return helix_flags(sample_nhwc.transpose(2, 0, 1), L)

    def pos_in_spans(spans, L):
        m = np.zeros(L, bool)
        for s, e in spans:
            m[s:e] = True
        return m

    # A helix flag at index i is a d(i, i+4) window over residues [i, i+4]
    # (eval/helix_count.py). Selecting flags by the POSITION mask alone mixes
    # arms at block edges: a flag 1-4 residues before a block start reads the
    # block's geometry yet counted as "outside" (this inflated outside-block
    # helicity past in-block in the round-3 n=8 report — the negative margin
    # VERDICT r3 weak #3 flagged). Classify by the WHOLE window instead
    # (module-level window_all/window_any/dilate): "inside" = all W residues
    # in a span; "outside" = no residue within the 2-dilated spans.
    in_true, out_true, in_shift, vacated = [], [], [], []
    for samp_true, samp_shift, lengths_np, spans_all, spans_shift in (
            rounds_data):
        for j, L in enumerate(lengths_np):
            ft = flags_of(samp_true[j], L)  # length L-4: d(i, i+4) flags
            fs = flags_of(samp_shift[j], L)
            nf = len(ft)

            m_true = pos_in_spans(spans_all[j], L)
            m_shift = pos_in_spans(spans_shift[j], L)

            sel_in_true = window_all(m_true, nf)
            sel_out = ~window_any(dilate(m_true), nf)
            sel_in_shift = window_all(m_shift, nf)
            # vacated: fully inside a GT span, window clear of every
            # shifted span
            sel_vac = sel_in_true & ~window_any(m_shift, nf)

            if sel_in_true.any():
                in_true.append(float(np.mean(ft[sel_in_true])))
            if sel_out.any():
                out_true.append(float(np.mean(ft[sel_out])))
            if sel_in_shift.any():
                in_shift.append(float(np.mean(fs[sel_in_shift])))
            if sel_vac.any():
                vacated.append(float(np.mean(fs[sel_vac])))

    def _mean(xs):
        # None (JSON null) rather than NaN when an arm collected no data —
        # json.dump would emit the non-standard NaN token otherwise
        return round(float(np.mean(xs)), 4) if xs else None

    report = {
        "workdir": str(workdir),
        "trained_steps": step_trained,
        "pc_steps": args.steps,
        "num_designs": bs * args.rounds,
        "shift_residues": SHIFT,
        "window_classified": True,
        "param_dtype": args.param_dtype or "float32",
        "helicity_in_true_blocks": _mean(in_true),
        "helicity_outside_blocks": _mean(out_true),
        "helicity_in_shifted_blocks": _mean(in_shift),
        "helicity_vacated_positions": _mean(vacated),
        "platform": jax.devices()[0].platform,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
