"""Metrics/observability: TensorBoard scalars + JSONL fallback + profiler.

The reference logs `training_loss` / `avg_training_loss` / `avg_eval_loss` to
TensorBoard (`/root/reference/train.py:100-102,182-183,228,244`). Here the
same scalars flow to tensorboardX when available and always to a JSONL file;
`profile_trace` wraps `jax.profiler` for on-TPU timeline capture (the
reference has no profiling at all, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path


class MetricsWriter:
    def __init__(self, logdir):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "metrics.jsonl", "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(str(self.logdir))
        except Exception:
            self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step),
                        "time": time.time()}) + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(logdir, enabled: bool = True):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Per-phase wall-clock spans (the reference's ad-hoc time.time() calls,
    `/root/reference/sampling_rosetta.py:53,157-160`, made reusable)."""

    def __init__(self):
        self.spans = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0
