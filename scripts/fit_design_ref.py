"""Fit per-AA reference-energy offsets for the sequence designer.

Rosetta's `ref` energies are fit so that unconstrained design reproduces
native amino-acid composition; this script does the same for
`realize/design.py`: iteratively design a calibration set of backbones and
nudge each AA's reference offset up when over-used / down when under-used
relative to the composition of the NATIVE SET (Rosetta fits against its
native PDB set; the analog here is sequences emitted by the synthetic-native
generator on the calibration backbones — its class tables stay unseen, only
realized sequence composition is observed, exactly as with real natives).

The fitted offsets are frozen into `design.REF_OFFSET`; re-run this script
to regenerate them (calibration seeds are disjoint from eval seeds in
scripts/eval_design.py).

Usage: python scripts/fit_design_ref.py [--iters 20] [--eta 3.0]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--eta", type=float, default=3.0)
    p.add_argument("--n_bb", type=int, default=6)
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--init_current", action="store_true",
                   help="start from the frozen design.REF_OFFSET")
    p.add_argument("--processed", type=str, default=None,
                   help="calibrate on GT backbones from this processed dir "
                        "(non-eval remainder of design_eval_split, so "
                        "guaranteed disjoint from eval_design.py's split)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from text2protein_tpu.data.synthetic import helix_bundle_backbone
    from text2protein_tpu.realize import design as D

    if args.processed:
        from text2protein_tpu.data import ProteinProcessedDataset, load_record
        from text2protein_tpu.realize.design_learned import design_eval_split
        from pathlib import Path

        processed = Path(args.processed)
        ds = ProteinProcessedDataset(str(processed))
        # calibrate only on the NON-eval remainder of the canonical split so
        # REF_OFFSET is never fit on eval_design.py's benchmark backbones
        _, rest = design_eval_split(ds.data_paths)
        rng = np.random.RandomState(99)
        rng.shuffle(rest)
        bbs = [load_record(processed / p)["coords"]
               for p in rest[: args.n_bb]]
    else:
        lengths = [64, 80, 96]
        bbs = [
            helix_bundle_backbone(lengths[k % len(lengths)],
                                  seed=args.seed + 31 * k, compact=False)
            for k in range(args.n_bb)
        ]
    from text2protein_tpu.data.synthetic_seq import native_like_sequence

    # native-set composition: many sampled native sequences per backbone
    nat_counts = np.zeros(20)
    for k, bb in enumerate(bbs):
        for r in range(8):
            seq, _, _ = native_like_sequence(bb, seed=50_000 + 13 * k + r)
            for ch in seq:
                nat_counts[D._IDX[ch]] += 1
    bg = nat_counts / nat_counts.sum()
    print("native-set composition:",
          {D.AA20[i]: round(float(bg[i]), 3) for i in np.argsort(-bg)[:8]})

    offset = D.REF_OFFSET.copy() if args.init_current else np.zeros(20, np.float32)
    for it in range(args.iters):
        counts = np.zeros(20)
        for k, bb in enumerate(bbs):
            seq, _ = D.design_sequence(
                bb, seed=1000 + it * 97 + k,
                weights={"ref_offset": offset},
            )
            for ch in seq:
                counts[D._IDX[ch]] += 1
        comp = counts / counts.sum()
        eta = args.eta * 0.87**it
        offset = offset + eta * (comp - bg).astype(np.float32)
        err = float(np.abs(comp - bg).sum()) / 2
        print(f"iter {it}: composition L1/2 error {err:.3f} (eta {eta:.2f})")

    print("REF_OFFSET = np.array([")
    for i in range(0, 20, 5):
        row = ", ".join(f"{offset[j]:+.4f}" for j in range(i, i + 5))
        print(f"    {row},")
    print("], np.float32)")


if __name__ == "__main__":
    main()
