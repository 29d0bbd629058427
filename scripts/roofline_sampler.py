"""Sampler roofline accounting (round-4 verdict #5): anchor the headline
samples/min numbers to the hardware, not just to the driver target.

Per model scale this computes, via AOT lowering + XLA cost analysis (no
device needed — FLOP counts are backend-independent properties of the HLO):

    flops_per_eval   one score-network evaluation at the bench batch
    roofline         peak_bf16 * 60 / (flops_per_eval/batch * NFE)
                     = samples/min/chip if the MXU never stalled
    fraction         measured / roofline

The PC chain at `--steps` predictor steps costs NFE = 2*steps evals
(predictor + corrector, `/root/reference/score_sde_pytorch/sampling.py:279-289`);
the measured headline numbers come from bench.py / README.

TPU v5e peak: 197 TFLOP/s bf16 (the constant bench.py's train MFU uses).

Usage: python scripts/roofline_sampler.py [--out reports/roofline_sampler.json]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_BF16 = 197e12


def flops_per_eval(config_path, batch, dtype="bfloat16"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.models import build_model

    config = load_config(config_path)
    if dtype:
        config.model.dtype = dtype
    model = build_model(config)
    n = int(config.data.max_res_num)
    c = int(config.data.num_channels)
    d = int(config.model.context_dim)

    def init_shapes():
        return model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, n, n, c)), jnp.zeros((1,)),
            jnp.zeros((1, 4, d)),
        )["params"]

    params_shapes = jax.eval_shape(init_shapes)
    x = jax.ShapeDtypeStruct((batch, n, n, c), jnp.float32)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((batch, 4, d), jnp.float32)

    def apply(p, x, t, ctx):
        return model.apply({"params": p}, x, t, ctx)

    compiled = jax.jit(apply).lower(params_shapes, x, t, ctx).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree.leaves(params_shapes)
    )
    return float(ca["flops"]), n, n_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="reports/roofline_sampler.json")
    p.add_argument("--measured_l128", type=float, default=30.1,
                   help="measured L=128 samples/min/chip (bench.py headline)")
    p.add_argument("--measured_n256", type=float, default=0.795,
                   help="measured N=256 samples/min/chip (CLAUDE.md)")
    args = p.parse_args()

    rows = {}
    for key, cfg, batch, steps, measured in (
        ("l128", "configs/bench_l128.yml", 16, 1000, args.measured_l128),
        ("n256", "configs/test_config.yml", 4, 1000, args.measured_n256),
    ):
        flops, n, n_params = flops_per_eval(cfg, batch)
        nfe = 2 * steps
        per_sample = flops / batch * nfe
        roofline = PEAK_BF16 * 60.0 / per_sample
        rows[key] = {
            "config": cfg,
            "batch": batch,
            "max_res_num": n,
            "params_m": round(n_params / 1e6, 1),
            "flops_per_eval_batch": flops,
            "tflops_per_sample_per_eval": round(flops / batch / 1e12, 4),
            "pc_steps": steps,
            "nfe": nfe,
            "roofline_samples_per_min_per_chip": round(roofline, 3),
            "measured_samples_per_min_per_chip": measured,
            "fraction_of_roofline": round(measured / roofline, 3),
        }
        print(f"{key}: {flops/batch/1e12:.3f} TFLOP/sample/eval, roofline "
              f"{roofline:.2f} samples/min, measured {measured} "
              f"({measured/roofline:.1%})")

    report = {"peak_bf16_flops": PEAK_BF16, "rows": rows}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
