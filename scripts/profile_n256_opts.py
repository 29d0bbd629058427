"""N=256 sampler optimization experiments (VERDICT round-1 #4).

Round-1 baseline: 0.80 samples/min/chip at 1000 PC steps (B=4, chunked).
profile_sampler.py established the chain is compute-bound and batch-flat
(B=2: 181 ms/step, B=4: 377 ms/step -> ~22% MFU), so the wins must come from
per-FLOP efficiency. This script measures PC-step time for a set of model
variants, optionally dumping a jax.profiler trace for op-level attribution.

Usage: python scripts/profile_n256_opts.py [--batch 4] [--steps 10]
         [--variants base norm_bf16] [--trace /tmp/trace_n256]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VARIANTS = ("base", "norm_bf16")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="configs/test_config.yml")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--variants", nargs="*", default=list(VARIANTS))
    p.add_argument("--trace", type=str, default=None,
                   help="dump a profiler trace of the LAST variant's chain")
    p.add_argument("--flops", action="store_true",
                   help="print XLA cost-analysis FLOPs for one UNet eval")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_pc_sampler
    from text2protein_tpu.models import build_model

    b = args.batch
    results = {}
    for variant in args.variants:
        config = load_config(args.config)
        config.model.dtype = "bfloat16"
        if variant == "norm_bf16":
            config.model.norm_dtype = "bfloat16"
        n = config.data.max_res_num
        c = config.data.num_channels

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

        if args.flops and variant == args.variants[0]:
            tvec = jnp.full((b,), 123.0)
            fwd = jax.jit(lambda p_, x_: model.apply(
                {"params": p_}, x_, tvec, context=context,
                context_mask=context_mask, train=False))
            try:
                ca = fwd.lower(params, x0).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                print(f"UNet eval FLOPs (XLA): {float(ca['flops']):.3e} "
                      f"(batch {b})")
            except Exception as e:
                print(f"cost_analysis unavailable: {e}")

        sampler = get_pc_sampler(
            sde, model, (b, n, n, c), snr=config.sampling.snr, eps=eps,
            num_steps=args.steps,
        )

        def run(p_):
            out, _ = sampler(p_, jax.random.PRNGKey(0), context=context,
                             context_mask=context_mask)
            return out

        np.asarray(run(params)[0, 0, 0])  # compile + warm + sync
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(params)[0, 0, 0])
            times.append(time.perf_counter() - t0)
        per_step = min(times) / args.steps  # one PC step = 2 UNet evals
        spm = b / (1000 * per_step) * 60  # samples/min at 1000 PC steps
        results[variant] = (per_step, spm)
        print(f"{variant:12s}: {per_step * 1e3:7.1f} ms/step  "
              f"-> {spm:.2f} samples/min at 1000 steps (B={b})")

        if args.trace and variant == args.variants[-1]:
            with jax.profiler.trace(args.trace):
                np.asarray(run(params)[0, 0, 0])
            print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
