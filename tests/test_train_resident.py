"""Resident-prep trainer path (cli/train.py, round 4).

With data.featurize_on_device + training.steps_per_launch > 1, featurization
and caption-context lookup run as their own jitted launch and per-record
context embeddings are gathered from a device-resident bf16 table by the
record indices the loader now attaches — the fused K-step train program then
contains no featurize work (it OOM'd the N=256 B=8 program by 213M when
folded into the scan) and per-launch host->device traffic drops ~20x.
"""

import numpy as np
import pytest
import yaml

TINY_MODEL = {
    "nf": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
    "attn_resolutions": [32], "n_heads": 2, "context_dim": 16,
    "num_scales": 16, "dropout": 0.0,
}


def _write_cfg(tmp_path, steps_per_launch):
    cfg = {
        "training": {
            "sde": "vesde", "n_iters": 100, "batch_size": 2,
            "snapshot_freq": 100, "log_freq": 4, "eval_freq": 6,
            "snapshot_freq_for_preemption": 100, "snapshot_sampling": False,
            "steps_per_launch": steps_per_launch, "epochs": 100000,
        },
        "data": {
            "processed_dataset_path": "data/processed_synth",
            "min_res_num": 16, "max_res_num": 128, "num_channels": 5,
            "featurize_on_device": True,
        },
        "model": dict(TINY_MODEL, condition=["length"]),
        "optim": {"warmup": 2},
        "text": {"encoder": "hash", "pad_to_bucket": 8, "max_tokens": 8},
        "seed": 7,
    }
    path = tmp_path / "resident.yml"
    path.write_text(yaml.safe_dump(cfg))
    return path


@pytest.mark.slow
def test_resident_prep_trains_and_checkpoints(tmp_path):
    from text2protein_tpu.cli.train import main

    cfg = _write_cfg(tmp_path, steps_per_launch=3)
    workdir = main([str(cfg), "--max_steps", "6",
                    "--workdir_root", str(tmp_path / "wd"), "--local_test"])
    # fused launches advanced the step counter and checkpointed
    assert (workdir / "checkpoints-meta").exists()
    log = (workdir / "config.yml").read_text()
    assert "featurize_on_device: true" in log

    # loader attached global record indices (the table-gather key)
    from text2protein_tpu.data import ProteinProcessedDataset
    from text2protein_tpu.data.loader import PrefetchLoader

    ds = ProteinProcessedDataset("data/processed_synth")
    loader = PrefetchLoader(ds, np.arange(4), 2, 128, seed=0, shuffle=False)
    batch = next(iter(loader))
    assert batch["index"].tolist() == [0, 1]
    assert ds.caption(0) == batch["caption"][0]
