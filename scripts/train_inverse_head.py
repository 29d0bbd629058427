"""Train the learned inverse-folding head on the synthetic corpus.

Training pairs are (GT backbone, synthetic-native sequence) — the learning
problem ProteinMPNN solves on real natives, at toy scale. The TRAIN split is
everything OUTSIDE the eval split used by scripts/eval_design.py (seed-0
shuffle, first n*len(lengths) records), so recovery numbers are held-out.

Usage:
  python scripts/train_inverse_head.py --processed data/processed_synth_text
      [--temperature 0.22] [--eval_n 32] [--samples_per_bb 2]
Writes text2protein_tpu/realize/inverse_head.npz.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--processed", type=str, default="data/processed_synth_text")
    p.add_argument("--temperature", type=float, default=0.22)
    p.add_argument("--eval_n", type=int, default=32,
                   help="matches scripts/eval_design.py --n (x3 lengths)")
    p.add_argument("--samples_per_bb", type=int, default=2)
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from text2protein_tpu.data import ProteinProcessedDataset, load_record
    from text2protein_tpu.data.synthetic_seq import native_like_sequence
    from text2protein_tpu.realize.design_learned import (
        design_eval_split, train_head,
    )

    processed = Path(args.processed)
    ds = ProteinProcessedDataset(str(processed))
    _, train_paths = design_eval_split(
        ds.data_paths, n_eval=args.eval_n * 3, seed=args.seed)
    print(f"{len(train_paths)} training records "
          f"(first {args.eval_n * 3} reserved for eval)")

    t0 = time.time()
    bbs, seqs = [], []
    for k, path in enumerate(train_paths):
        bb = load_record(processed / path)["coords"]
        for r in range(args.samples_per_bb):
            nat, _, _ = native_like_sequence(
                bb, seed=70_000 + 31 * k + r, temperature=args.temperature
            )
            bbs.append(bb)
            seqs.append(nat)
    print(f"built {len(bbs)} training pairs ({time.time() - t0:.0f}s)")

    head = train_head(bbs, seqs, iters=args.iters, seed=args.seed)
    head.save()
    # training-set accuracy as a sanity check (NOT the reported metric)
    acc = []
    for bb, seq in zip(bbs[:40], seqs[:40]):
        pred = head.design(bb)
        acc.append(np.mean([a == b for a, b in zip(seq, pred)]))
    print(f"train-split accuracy (sanity): {np.mean(acc):.3f}")
    print("saved text2protein_tpu/realize/inverse_head.npz")


if __name__ == "__main__":
    main()
