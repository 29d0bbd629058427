"""PrefetchLoader: ordering, drop_last, host sharding, error propagation."""

import numpy as np
import pytest

from text2protein_tpu.data.loader import PrefetchLoader


class FakeDataset:
    def __init__(self, n, L=8):
        self.n = n
        self.L = L

    def __getitem__(self, i):
        L = self.L
        return {
            "id": f"rec{i}",
            "coords": np.zeros((L, 3, 3), np.float32),
            "coords_6d": np.full((5, L, L), float(i), np.float32),
            "aa": np.zeros(L, np.int64),
            "aa_str": "A" * L,
            "mask_pair": np.ones((L, L), bool),
            "ss_indices": "",
            "caption": f"caption {i}",
        }


def test_batches_and_drop_last():
    ds = FakeDataset(10)
    loader = PrefetchLoader(ds, np.arange(10), batch_size=4, max_len=8,
                            shuffle=False)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert batches[0]["coords_6d"].shape == (4, 5, 8, 8)
    assert batches[0]["id"] == ["rec0", "rec1", "rec2", "rec3"]

    loader2 = PrefetchLoader(ds, np.arange(10), batch_size=4, max_len=8,
                             shuffle=False, drop_last=False)
    batches2 = list(loader2)
    assert len(batches2) == 3
    assert len(batches2[-1]["id"]) == 2


def test_shuffle_covers_all_and_differs():
    ds = FakeDataset(16)
    ids1 = [i for b in PrefetchLoader(ds, np.arange(16), 4, 8, seed=1)
            for i in b["id"]]
    ids2 = [i for b in PrefetchLoader(ds, np.arange(16), 4, 8, seed=2)
            for i in b["id"]]
    assert sorted(ids1) == sorted(f"rec{i}" for i in range(16))
    assert ids1 != ids2


def test_host_sharding_partitions():
    ds = FakeDataset(16)
    got = set()
    for h in range(2):
        loader = PrefetchLoader(ds, np.arange(16), 4, 8, shuffle=False,
                                host_id=h, host_count=2)
        for b in loader:
            got.update(b["id"])
    assert got == {f"rec{i}" for i in range(16)}


def test_prepare_fn_and_error_propagation():
    ds = FakeDataset(8)

    def prepare(batch):
        batch["extra"] = np.ones(3)
        return batch

    loader = PrefetchLoader(ds, np.arange(8), 4, 8, prepare_fn=prepare)
    for b in loader:
        assert "extra" in b

    def bad(batch):
        raise RuntimeError("boom")

    loader2 = PrefetchLoader(ds, np.arange(8), 4, 8, prepare_fn=bad)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader2)
