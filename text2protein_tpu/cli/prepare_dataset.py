"""Dataset preparation CLI — `python -m text2protein_tpu.cli.prepare_dataset
<config> [--local_test]`.

`/root/reference/prepare_dataset.py:7-24`: walk the configured PDB tree and
write one feature record per accepted protein.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="Featurize a PDB tree into records")
    p.add_argument("config", type=str)
    p.add_argument("--local_test", action="store_true")
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=None)
    args = p.parse_args(argv)

    from ..config import load_config
    from ..data import ProteinDataset

    config = load_config(args.config)
    ss_constraints = config.data.num_channels == 8
    out_dir = args.out_dir or config.data.processed_dataset_path or "processed"

    ds = ProteinDataset(
        config.data.dataset_path,
        description_path=config.data.caption_path,
        out_dir=out_dir,
        min_res_num=config.data.min_res_num,
        max_res_num=config.data.max_res_num,
        ss_constraints=ss_constraints,
        local_test=args.local_test,
        num_workers=args.num_workers,
    )
    t0 = time.perf_counter()
    n = ds.process()
    dt = time.perf_counter() - t0
    total = len(ds.pdb_paths)
    print(
        f"wrote {n}/{total} records to {out_dir} in {dt:.1f}s "
        f"({total / max(dt, 1e-9):.1f} structs/s scanned)"
    )
    return n


if __name__ == "__main__":
    main()
