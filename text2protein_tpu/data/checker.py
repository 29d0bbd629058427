"""Dataset sanity utilities (`/root/reference/file_checker.py:11-86`):
caption <-> PDB set intersection report and caption backfill into processed
records, plus a batch smoke check."""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from .dataset import load_record, save_record, ProteinProcessedDataset, make_batch


def compare_pdb_file_and_caption(dataset_path, caption_path) -> dict:
    """Set intersection between PDB files on disk and caption entries."""
    pdb_ids = set()
    for root, _dirs, files in os.walk(dataset_path):
        for f in files:
            pdb_ids.add(Path(f).stem)
    with open(caption_path) as f:
        ann = json.load(f)
    if isinstance(ann, dict):
        caption_ids = set(ann.keys())
    else:
        caption_ids = {a["pdb_id"] for a in ann}
    both = pdb_ids & caption_ids
    return {
        "num_pdbs": len(pdb_ids),
        "num_captions": len(caption_ids),
        "num_both": len(both),
        "pdb_only": sorted(pdb_ids - caption_ids)[:20],
        "caption_only": sorted(caption_ids - pdb_ids)[:20],
    }


def backfill_captions(processed_dir, caption_path) -> int:
    """Write captions into already-processed records that lack them
    (`/root/reference/file_checker.py:30-49`)."""
    with open(caption_path) as f:
        ann = json.load(f)
    if not isinstance(ann, dict):
        ann = {a["pdb_id"]: a["caption"] for a in ann}
    n = 0
    for p in Path(processed_dir).glob("*.npz"):
        rec = load_record(p)
        if not rec["caption"] and rec["id"] in ann:
            rec["caption"] = ann[rec["id"]]
            save_record(rec, p)
            n += 1
    return n


def batch_smoke_check(processed_dir, max_len, batch_size=4) -> dict:
    """Load a batch and report shapes/finite-ness (the reference's manual
    smoke test, `file_checker.py:52-86`)."""
    ds = ProteinProcessedDataset(processed_dir)
    recs = [ds[i] for i in range(min(batch_size, len(ds)))]
    batch = make_batch(recs, max_len)
    return {
        "num_records": len(ds),
        "coords_6d": list(batch["coords_6d"].shape),
        "finite": bool(np.isfinite(batch["coords_6d"]).all()),
        "lengths": batch["length"].tolist(),
    }


def main(argv=None):
    """CLI mirror of the reference's __main__ smoke block
    (`/root/reference/file_checker.py:52-86`): caption<->PDB intersection,
    optional caption backfill, and a batch smoke check driven by a config."""
    import argparse

    import yaml

    p = argparse.ArgumentParser(description="dataset sanity checks")
    p.add_argument("config", type=str)
    p.add_argument("--backfill", action="store_true",
                   help="write captions into processed records lacking them")
    p.add_argument("--batch_size", type=int, default=4)
    args = p.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    data = cfg["data"]

    report = {}
    # Path("") is PosixPath(".") and always exists — require non-empty keys
    dataset_path = data.get("dataset_path") or ""
    caption_path = data.get("caption_path") or ""
    if dataset_path and caption_path and Path(dataset_path).exists() \
            and Path(caption_path).exists():
        report["intersection"] = compare_pdb_file_and_caption(
            dataset_path, caption_path)
    if args.backfill:
        report["backfilled"] = backfill_captions(
            data["processed_dataset_path"], data["caption_path"])
    report["smoke"] = batch_smoke_check(
        data["processed_dataset_path"], data["max_res_num"],
        batch_size=args.batch_size)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    main()
