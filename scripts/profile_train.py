"""Decompose the L=128 train-step cost on TPU (VERDICT r2 #4).

Round 2 recorded 17.3% train MFU at B=8 vs 64% for the forward-only sampler,
with no trace. This script isolates the launch-overhead vs compute split and
captures a device trace of the fused multi-step program:

  1. single-step launch (the round-2 measurement configuration),
  2. K-step fused launch (the production path) at several batch sizes,
  3. forward-only loss (no grad) for the fwd:bwd time ratio,
  4. optional jax.profiler trace of the fused step -> parse with
     scripts/parse_trace.py.

Usage: python scripts/profile_train.py [--config configs/bench_l128.yml]
         [--batches 8 16 32] [--k 10] [--trace /tmp/trace_train]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[-1])


def timeit(fn, *args, repeats=3):
    sync(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"])
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="configs/bench_l128.yml")
    p.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--trace", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.losses import get_sde_loss_fn
    from text2protein_tpu.models import build_model
    from text2protein_tpu.training import (
        create_train_state, make_multi_train_step, make_train_step,
    )

    config = load_config(args.config)
    config.model.dtype = args.dtype
    n = config.data.max_res_num
    c = config.data.num_channels
    peak = 197e12 if args.dtype == "bfloat16" else 98.5e12

    sde, _ = get_sde(config)
    model = build_model(config)

    def make_batch(b):
        rng = np.random.RandomState(0)
        mask = np.zeros((b, n, n), bool)
        mask[:, :n, :n] = True
        coords = rng.uniform(-1, 1, (b, n, n, c)).astype(np.float32)
        coords[..., -1] = 1.0
        return {
            "coords_6d": jnp.asarray(coords),
            "mask_pair": jnp.asarray(mask),
            "ss_spans": jnp.full((b, 32, 2), -1, jnp.int32),
            "length": jnp.full((b,), n, jnp.int32),
            "context": jnp.asarray(
                rng.randn(b, 64, config.model.context_dim).astype(np.float32)),
            "context_mask": jnp.asarray(np.ones((b, 64), bool)),
        }

    for b in args.batches:
        batch = make_batch(b)
        state = create_train_state(config, model, jax.random.PRNGKey(0), batch)

        single = make_train_step(config, sde, model, donate=False)
        t1 = timeit(single, state, batch, jax.random.PRNGKey(1))
        f1 = flops_of(single, state, batch, jax.random.PRNGKey(1))

        multi = make_multi_train_step(config, sde, model, donate=False)
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (args.k,) + x.shape), batch)
        tk = timeit(multi, state, stacked, jax.random.PRNGKey(1))

        loss_fn = get_sde_loss_fn(sde, model, train=True,
                                  condition=tuple(config.model.condition))
        fwd = jax.jit(lambda p, bt, r: loss_fn(p, bt, r))
        tf = timeit(fwd, state.params, batch, jax.random.PRNGKey(1))

        mfu1 = f1 / t1 / peak if f1 else float("nan")
        # cost_analysis counts the lax.scan body ONCE regardless of trip
        # count, so fk == f1 and dividing by the k-step wall time would
        # under-report fused MFU by exactly k; use per-step flops instead.
        mfuk = f1 / (tk / args.k) / peak if f1 else float("nan")
        overhead = t1 - tk / args.k
        print(f"B={b}: single {t1*1000:.1f}ms (MFU {100*mfu1:.1f}%) | "
              f"fused/{args.k} {tk/args.k*1000:.1f}ms (MFU {100*mfuk:.1f}%) "
              f"| per-launch overhead ~{overhead*1000:.1f}ms | "
              f"fwd-only {tf*1000:.1f}ms (fwd:step {tf/(tk/args.k):.2f})",
              flush=True)

        if args.trace and b == args.batches[-1]:
            with jax.profiler.trace(args.trace):
                sync(multi(state, stacked, jax.random.PRNGKey(2)))
            print(f"trace written to {args.trace}; parse with "
                  f"scripts/parse_trace.py")


if __name__ == "__main__":
    main()
