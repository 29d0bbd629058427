"""6D-map MSE evaluation (`/root/reference/coords_compare.py:11-63`):
sampled map vs ground-truth record on the real [:L, :L] crop, plus aggregate
avg/min/max/std stats."""

from __future__ import annotations

import math
import pickle
from pathlib import Path

import numpy as np
import yaml


def infer_length_from_padding(sample_cnn: np.ndarray) -> int:
    """Recover L from the padding channel: sqrt(#ones) must be an integer
    (`/root/reference/sampling_rosetta.py:69-74`)."""
    n_ones = int((sample_cnn[-1] > 0.5).sum())
    l = int(round(math.sqrt(n_ones)))
    if l * l != n_ones:
        raise ValueError(f"padding channel is not a square: {n_ones} ones")
    return l


def mse_6d(sample_cnn: np.ndarray, gt_cnn: np.ndarray, num_res: int,
           channels: slice | None = None) -> float:
    """Mean squared error on the real crop. The reference averages over ALL
    channels (`/root/reference/coords_compare.py:40`); pass channels=slice(0,4)
    to restrict to the geometry channels."""
    ch = channels if channels is not None else slice(None)
    s = sample_cnn[ch, :num_res, :num_res]
    g = gt_cnn[ch, :num_res, :num_res]
    return float(np.mean((s - g) ** 2))


def coord_compare(sample_dir, gt_dir, out_path=None) -> dict:
    """Compare every sampled_{id}.pkl under sample_dir against the matching
    ground-truth record; write avg/min/max/std yaml like the reference."""
    from ..data import load_record

    sample_dir = Path(sample_dir)
    gt_dir = Path(gt_dir)
    per_pdb = {}
    for pkl_path in sorted(sample_dir.glob("sampled_*.pkl")):
        pdb_id = pkl_path.stem[len("sampled_") :]
        gt_path = None
        for ext in (".npz", ".pt"):
            cand = gt_dir / f"{pdb_id}{ext}"
            if cand.exists():
                gt_path = cand
                break
        if gt_path is None:
            continue
        with open(pkl_path, "rb") as f:
            sample = np.asarray(pickle.load(f))
        if sample.ndim == 4:
            sample = sample[0]
        rec = load_record(gt_path)
        gt = rec["coords_6d"]
        num_res = gt.shape[1]  # unpadded record length (coords_compare.py:34)
        per_pdb[pdb_id] = mse_6d(sample, gt, num_res)

    values = np.array(list(per_pdb.values())) if per_pdb else np.array([np.nan])
    stats = {
        "per_pdb": {k: float(v) for k, v in per_pdb.items()},
        "avg": float(np.mean(values)),
        "min": float(np.min(values)),
        "max": float(np.max(values)),
        "std": float(np.std(values)),
        "count": len(per_pdb),
    }
    if out_path:
        with open(out_path, "w") as f:
            yaml.safe_dump(stats, f)
    return stats


def main(argv=None):
    """CLI mirror of the reference script (`/root/reference/
    coords_compare.py:62-63` runs coord_compare() as __main__): compare a
    directory of sampled_*.pkl maps to ground-truth records and write the
    aggregate yaml next to the sample dir."""
    import argparse

    p = argparse.ArgumentParser(
        description="6D-map MSE: sampled_*.pkl vs ground-truth records")
    p.add_argument("sample_dir", type=str)
    p.add_argument("gt_dir", type=str,
                   help="processed records dir (.npz or reference .pt)")
    p.add_argument("--out", type=str, default=None,
                   help="output yaml (default: <sample_dir>/../"
                        "coords_6d_losses.yaml, the reference's name)")
    args = p.parse_args(argv)

    out = args.out or str(
        Path(args.sample_dir).parent / "coords_6d_losses.yaml")
    stats = coord_compare(args.sample_dir, args.gt_dir, out_path=out)
    print(f"{stats['count']} pairs  avg={stats['avg']:.5f} "
          f"min={stats['min']:.5f} max={stats['max']:.5f} "
          f"std={stats['std']:.5f} -> {out}")
    return 0


if __name__ == "__main__":
    main()
