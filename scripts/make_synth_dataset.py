"""Generate a synthetic helix-bundle training corpus as processed records.

No PDB corpus ships with this environment, so the quality-loop training runs
(VERDICT #7) train on ideal-geometry synthetic bundles (data/synthetic.py).
Records are written in the processed-dataset schema (`data/dataset.py
save_record`), so `cli/train.py` consumes them exactly like reference-style
preprocessed dicts (`/root/reference/dataset.py:510-542`).

Generation is batched on the device: structures are grouped by length and the
NeRF build + Rg-compaction run vmapped (one CPU core on this host would take
~43 s/structure; the TPU does a 48-batch in seconds).

Usage: python scripts/make_synth_dataset.py --out data/processed_synth \
         --num 384 --n_max 128 --min_len 64 --length_step 8
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="data/processed_synth")
    p.add_argument("--num", type=int, default=384)
    p.add_argument("--n_max", type=int, default=128)
    p.add_argument("--min_len", type=int, default=64)
    p.add_argument("--length_step", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ss_constraints", action="store_true",
                   help="C=8 records with SS block channels")
    p.add_argument("--vary_placement", action="store_true",
                   help="randomize per-helix segment lengths so SS block "
                        "PLACEMENT varies at fixed (L, n_helices) — required "
                        "for a corpus that can teach placement steering "
                        "(reports/quality_ss_spec.json measured it "
                        "unlearnable from the equal-split corpus)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu) — generation is "
                        "device-batched and the default backend wins "
                        "otherwise; cpu takes ~43 s/structure on this host "
                        "so only use it for tiny corpora")
    p.add_argument("--decorrelate_helices", action="store_true",
                   help="sample the helix count per record independently of "
                        "L (valid_helix_counts) so the caption's helix count "
                        "carries information length alone cannot — the "
                        "text-conditioning corpus (VERDICT r2 #1)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from text2protein_tpu.data.dataset import save_record
    from text2protein_tpu.data.featurize import featurize_structure
    from text2protein_tpu.data.synthetic import (
        default_n_helices,
        helix_bundle_backbones,
        valid_helix_counts,
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    lengths = list(range(args.min_len, args.n_max + 1, args.length_step))
    per_l = -(-args.num // len(lengths))
    n_written = 0
    t0 = time.time()
    for li, L in enumerate(lengths):
        n_here = min(per_l, args.num - n_written)
        if n_here <= 0:
            break
        seeds = [args.seed + 100_000 * li + 77 * j for j in range(n_here)]
        if args.decorrelate_helices:
            choices = valid_helix_counts(L)
            rng = np.random.RandomState(args.seed + 13 * li)
            n_hels = [int(choices[rng.randint(len(choices))])
                      for _ in range(n_here)]
        else:
            n_hels = [default_n_helices(L)] * n_here
        t1 = time.time()
        bbs = helix_bundle_backbones(L, seeds, n_helices=n_hels,
                                     vary_placement=args.vary_placement)
        print(f"L={L}: built {n_here} backbones in {time.time() - t1:.1f}s "
              f"(helix counts {sorted(set(n_hels))})")
        for j, bb in enumerate(bbs):
            c6d, mask_pair, ss_indices = featurize_structure(
                bb, np.ones(L), ss_constraints=args.ss_constraints
            )
            if c6d is None:
                continue
            n_hel = n_hels[j]
            record = {
                "id": f"synth_{L:03d}_{j:04d}",
                "coords": bb.astype(np.float32),
                "coords_6d": c6d,
                "aa": np.zeros(L, np.int64),  # poly-ALA (letter_to_num['A']=0)
                "aa_str": "A" * L,
                "mask_pair": mask_pair,
                "ss_indices": ss_indices or "",
                "caption": (
                    f"synthetic alpha helical bundle protein with {n_hel} "
                    f"helices and {L} residues"
                ),
            }
            save_record(record, out / f"{record['id']}.npz")
            n_written += 1
    print(f"wrote {n_written} records to {out} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
