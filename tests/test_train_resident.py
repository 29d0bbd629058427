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


def test_context_table_dedup_matches_direct_encode():
    """The dedup'd resident table must reproduce per-record direct encoding
    exactly: table[inv[i]] == encode(caption(i)) (values within bf16 cast,
    masks bit-equal). Guards the round-5 unique-caption indirection — a
    wrong inv[] silently trains the model on mismatched captions, which
    presents as 'the model ignores text' only much later, at steering-eval
    time."""
    import numpy as np
    import jax.numpy as jnp

    from text2protein_tpu.data import ProteinProcessedDataset
    from text2protein_tpu.text import build_text_encoder
    from helpers import tiny_config

    config = tiny_config()
    ds = ProteinProcessedDataset("data/processed_synth")
    n = min(len(ds), 24)
    enc = build_text_encoder(config)

    # mirror cli/train.py build_context_table_host
    uniq = {}
    inv = np.empty(n, np.int32)
    for i in range(n):
        inv[i] = uniq.setdefault(ds.caption(i), len(uniq))
    ucaps = list(uniq)
    assert len(ucaps) < n, "corpus should repeat captions"
    embs, masks = [], []
    for i in range(0, len(ucaps), 64):
        e, m = enc.encode(ucaps[i:i + 64])
        embs.append(np.asarray(e))
        masks.append(np.asarray(m))
    t_max = max(e.shape[1] for e in embs)
    embs = [np.pad(e, ((0, 0), (0, t_max - e.shape[1]), (0, 0)))
            for e in embs]
    masks = [np.pad(m, ((0, 0), (0, t_max - m.shape[1]))) for m in masks]
    table = np.concatenate(embs).astype(jnp.bfloat16)
    mask_table = np.concatenate(masks).astype(bool)

    for i in range(n):
        e, m = enc.encode([ds.caption(i)])
        e, m = np.asarray(e)[0], np.asarray(m)[0]
        row = np.asarray(table[inv[i]], np.float32)[: e.shape[0]]
        np.testing.assert_allclose(
            row, e, atol=0.02,
            err_msg=f"record {i}: table row != direct encode"
        )
        assert (mask_table[inv[i]][: m.shape[0]] == m).all(), i
