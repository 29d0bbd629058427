"""Host input pipeline: shuffled epoch batching with background prefetch.

The reference uses torch DataLoader with default workers; here a simple
double-buffered thread keeps the host pipeline (record IO + collate + text
encoding) off the device critical path. Per-host sharding hook for multi-host
training (each host loads its slice of the index space).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from .dataset import make_batch


class PrefetchLoader:
    """Iterate batches of records with background prefetching.

    Args:
      dataset: indexable record source (ProteinProcessedDataset).
      indices: global index array for this split.
      batch_size, max_len: batch geometry.
      prepare_fn: optional batch -> batch transform run in the worker thread
        (e.g. caption encoding); must be thread-safe.
      host_id/host_count: shard the index space across hosts.
    """

    def __init__(self, dataset, indices, batch_size, max_len, seed=0,
                 prepare_fn=None, prefetch=2, shuffle=True, drop_last=True,
                 host_id=0, host_count=1):
        self.dataset = dataset
        self.indices = np.asarray(indices)[host_id::host_count]
        self.batch_size = batch_size
        self.max_len = max_len
        self.prepare_fn = prepare_fn
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _produce(self, order, q):
        try:
            for i in range(0, len(order), self.batch_size):
                chunk = order[i : i + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    break
                recs = [self.dataset[int(j)] for j in chunk]
                batch = make_batch(recs, self.max_len)
                # global dataset indices — lets consumers gather per-record
                # device-resident data (e.g. the context-embedding table in
                # cli/train.py) instead of re-shipping it every step
                batch["index"] = np.asarray(chunk, dtype=np.int32)
                if self.prepare_fn is not None:
                    batch = self.prepare_fn(batch)
                q.put(batch)
        except Exception as e:  # surface worker errors to the consumer
            q.put(e)
        finally:
            q.put(None)

    def __iter__(self):
        order = (
            self.rng.permutation(self.indices) if self.shuffle else self.indices
        )
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(order, q), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item
        t.join()
