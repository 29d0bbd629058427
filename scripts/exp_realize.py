"""Experiment driver for realization-protocol tuning (GT-map round-trip).

Builds a compact helix bundle at L, featurizes it, and minimizes against its
own maps under a configurable protocol; reports per-restart TM and energy.
Runs on whatever device is live (TPU by default under axon).

Usage: python scripts/exp_realize.py [--L 64] [--iters 150] [--restarts 5]
       [--seed 0] [--method cartesian|torsion] [--cpu]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=64)
    p.add_argument("--iters", type=int, default=150)
    p.add_argument("--restarts", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--method", default="cartesian",
                   choices=["cartesian", "torsion"])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from text2protein_tpu.data.featurize import featurize_structure
    from text2protein_tpu.data.synthetic import helix_bundle_backbone
    from text2protein_tpu.realize.restraints import inverse_scale
    from text2protein_tpu.realize.minimize import run_minimization
    from text2protein_tpu.eval.tmscore import tm_score

    L = args.L
    bb_true = helix_bundle_backbone(L, seed=args.seed)
    c6d, _, _ = featurize_structure(bb_true, np.ones(L), ss_constraints=False)
    npz = inverse_scale(c6d, L)
    t0 = time.time()
    bb_min, e, energies = run_minimization(
        npz, "A" * L, n_restarts=args.restarts, max_iter=args.iters,
        seed=args.seed, method=args.method,
    )
    dt = time.time() - t0
    tm = tm_score(bb_min[:, 1], bb_true[:, 1])
    print(f"device={jax.devices()[0].platform} L={L} iters={args.iters} "
          f"restarts={args.restarts} method={args.method} time={dt:.1f}s")
    print("energies:", np.round(np.asarray(energies), 1))
    print(f"TM = {tm:.3f}")


if __name__ == "__main__":
    main()
