"""Decompose the reference-scale (N=256, 379M-param) sampler cost on TPU.

VERDICT round-1 #4: the N=256 path ran at 0.80 samples/min/chip with no
analysis of where time goes. This script times, per UNet evaluation:
  1. the UNet forward with f32 params (the round-1 configuration — weights
     are cast to bf16 inside each eval; if XLA does not hoist the cast out
     of the sampling scan, every eval re-reads 1.5 GB of f32 weights);
  2. the UNet forward with params pre-cast to bf16 (halved weight traffic);
  3. a full PC step (2 NN evals + predictor/corrector algebra);
and sweeps the batch size for the throughput knee.

Usage: python scripts/profile_sampler.py [--config configs/test_config.yml]
         [--batches 1 2 4 8] [--trace /tmp/jax_trace]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def sync(x):
    np.asarray(jax_leaf(x))


def jax_leaf(x):
    import jax

    return jax.tree.leaves(x)[0]


def timeit(fn, *args, repeats=3):
    fn(*args)  # compile + warm
    sync(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="configs/test_config.yml")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--batches", type=int, nargs="*", default=None)
    p.add_argument("--steps", type=int, default=20,
                   help="scan length for the PC-chain timing")
    p.add_argument("--trace", type=str, default=None,
                   help="write a jax.profiler trace of one PC chunk here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_pc_sampler
    from text2protein_tpu.models import build_model
    from text2protein_tpu.training.state import param_count

    config = load_config(args.config)
    config.model.dtype = "bfloat16"
    n = config.data.max_res_num
    c = config.data.num_channels
    b = args.batch

    sde, eps = get_sde(config)
    model = build_model(config)
    rng = np.random.RandomState(0)
    t_tokens, d_ctx = 64, config.model.context_dim
    x0 = jnp.zeros((b, n, n, c), jnp.float32)
    context = jnp.asarray(rng.randn(b, t_tokens, d_ctx).astype(np.float32))
    context_mask = jnp.asarray(np.ones((b, t_tokens), bool))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((b,)),
        context=context, context_mask=context_mask, train=False,
    )["params"]
    n_params = param_count(params)
    print(f"config={args.config} N={n} params={n_params / 1e6:.1f}M batch={b}")

    tvec = jnp.full((b,), 123.0)

    def fwd(p_, x_):
        return model.apply({"params": p_}, x_, tvec, context=context,
                           context_mask=context_mask, train=False)

    fwd_j = jax.jit(fwd)
    dt = timeit(fwd_j, params, x0)
    print(f"UNet eval (f32 params):    {dt * 1e3:8.1f} ms  "
          f"({b / dt:.2f} evals*batch/s)")

    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    dt_bf = timeit(fwd_j, params_bf16, x0)
    print(f"UNet eval (bf16 params):   {dt_bf * 1e3:8.1f} ms")

    # PC chain of args.steps (amortizes dispatch; NFE = 2 per step)
    sampler = get_pc_sampler(
        sde, model, (b, n, n, c), snr=config.sampling.snr, eps=eps,
        num_steps=args.steps,
    )

    def run_chain(p_):
        out, _ = sampler(p_, jax.random.PRNGKey(0), context=context,
                         context_mask=context_mask)
        return out

    dt_chain = timeit(run_chain, params, repeats=2)
    per_step = dt_chain / args.steps
    print(f"PC step (scan, f32 params):{per_step * 1e3:8.1f} ms/step  "
          f"-> {b / (2000 * per_step) * 60:.2f} samples/min at 2000 steps")
    dt_chain_bf = timeit(run_chain, params_bf16, repeats=2)
    per_step_bf = dt_chain_bf / args.steps
    print(f"PC step (scan, bf16 params):{per_step_bf * 1e3:7.1f} ms/step  "
          f"-> {b / (2000 * per_step_bf) * 60:.2f} samples/min at 2000 steps")

    if args.trace:
        with jax.profiler.trace(args.trace):
            sync(run_chain(params_bf16))
        print(f"trace written to {args.trace}")

    if args.batches:
        print("\nbatch sweep (bf16 params, PC scan):")
        for bb in args.batches:
            if bb == b:
                print(f"  B={bb}: {per_step_bf * 1e3:.1f} ms/step "
                      f"({bb / (2000 * per_step_bf) * 60:.2f} samples/min)")
                continue
            try:
                ctx = jnp.asarray(
                    rng.randn(bb, t_tokens, d_ctx).astype(np.float32)
                )
                cm = jnp.asarray(np.ones((bb, t_tokens), bool))
                smp = get_pc_sampler(
                    sde, model, (bb, n, n, c), snr=config.sampling.snr,
                    eps=eps, num_steps=args.steps,
                )

                def run(p_):
                    out, _ = smp(p_, jax.random.PRNGKey(0), context=ctx,
                                 context_mask=cm)
                    return out

                dtb = timeit(run, params_bf16, repeats=2) / args.steps
                print(f"  B={bb}: {dtb * 1e3:.1f} ms/step "
                      f"({bb / (2000 * dtb) * 60:.2f} samples/min)")
            except Exception as e:
                print(f"  B={bb}: FAILED ({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    main()
