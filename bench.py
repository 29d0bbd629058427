"""Benchmark: L=128 6D backbone samples/min/chip at 1000 PC steps.

The north-star metric from BASELINE.json (the reference publishes no numbers;
target >= 25 samples/min/chip on TPU v5e). Runs the flagship text-conditioned
L=128 sampler (VESDE, reverse-diffusion predictor + 1 Langevin corrector step,
NFE = 2 per PC step) end-to-end on the available device and prints its JSON
metric line: {"metric", "value", "unit", "vs_baseline"}.

The evidence chain is built to survive a driver timeout on a degraded tunnel
(round 3 lost its number to rc=124 — a 21.5 min first compile outlived the
driver's budget while the process printed nothing):
  1. a result recorded by a previous successful run this round
     (reports/bench_last.json) is re-emitted IMMEDIATELY at startup, flagged
     {"provisional": true, "cached": <timestamp>} — parseable before jax is
     even imported;
  2. a live provisional line (same flag, no "cached") is emitted after the
     FIRST timed repeat — a real steady-state measurement;
  3. the final unflagged line is emitted after all repeats and overwrites the
     record file. Consumers should take the LAST line printed.
SIGTERM/SIGINT re-flush the best-known line before exiting, and --budget_s
cuts remaining repeats when the wall budget is nearly spent.

Usage: python bench.py [--steps 1000] [--batch 16] [--repeats 2] [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_BEST_LINE = {"line": None}


def emit(obj):
    """Print a metric line; remember it for the SIGTERM flush."""
    line = json.dumps(obj)
    _BEST_LINE["line"] = line
    print(line, flush=True)


def install_signal_flush():
    import signal

    def handler(signum, frame):
        if _BEST_LINE["line"] is not None:
            print(_BEST_LINE["line"], flush=True)
        sys.stdout.flush()
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)


def result_signature(args):
    """The arg subset that must match for a recorded result to be reusable."""
    return {
        "metric_kind": args.metric, "sampler": args.sampler,
        "steps": args.steps, "batch": args.batch, "dtype": args.dtype,
        "param_dtype": args.param_dtype, "norm_dtype": args.norm_dtype,
        "config": args.config, "quick": bool(args.quick),
        # platform + launch chunking change what is measured: a cached
        # '--platform cpu' or odd-chunk record must never be re-emitted as
        # the provisional line for a default TPU run (advisor r4, medium)
        "platform": args.platform, "chunk": args.chunk,
    }


def emit_cached_record(path, sig):
    """Re-emit a same-signature result recorded earlier this round (the
    record file lives on the round's machine, not in git — it is always a
    real measurement from this hardware)."""
    try:
        with open(path) as f:
            rec = json.load(f)
        if rec.get("sig") == sig and isinstance(rec.get("result"), dict):
            emit({**rec["result"], "provisional": True,
                  "cached": rec.get("when")})
    except (OSError, ValueError):
        pass


def write_record(path, sig, result):
    try:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"sig": sig, "result": result,
                       "when": time.strftime("%Y-%m-%dT%H:%M:%S")}, f)
        os.replace(tmp, path)
    except OSError as e:
        print(f"# record write failed: {e}", file=sys.stderr)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--quick", action="store_true", help="tiny shapes (CI smoke)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--metric", type=str, default="sample",
                   choices=["sample", "train", "featurize"])
    p.add_argument("--sampler", type=str, default="pc",
                   choices=["pc", "hybrid"],
                   help="sample metric: pc = reference-spec chain (the "
                        "north-star metric); hybrid = ODE-head + PC-tail "
                        "deployment sampler (NFE 460, reports no "
                        "vs_baseline — different NFE budget)")
    p.add_argument("--config", type=str, default="configs/bench_l128.yml",
                   help="config YAML (e.g. configs/test_config.yml for the "
                        "reference-scale N=256 sampler)")
    p.add_argument("--param_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="sample metric: storage dtype for the model params "
                        "fed to the sampler. bfloat16 halves the HBM weight "
                        "traffic each of the NFE evals re-reads (opt-in; "
                        "the f32 default matches training numerics)")
    p.add_argument("--norm_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="override model.norm_dtype")
    p.add_argument("--steps_per_launch", type=int, default=1,
                   help="train metric: fuse K steps per device launch "
                        "(training.steps_per_launch's bench analog)")
    p.add_argument("--remat_resblocks", action="store_true",
                   help="train metric: rematerialize resblock activations "
                        "(model.remat_resblocks) — unlocks larger batches "
                        "at N=256 where activations cap HBM")
    p.add_argument("--chunk", type=int, default=None,
                   help="PC steps per device launch (default: largest "
                        "divisor of --steps <= 1000, or <= 100 for N>=256 — "
                        "single launches must stay under the tunnel's "
                        "wall-clock cap)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu — note the env var "
                        "JAX_PLATFORMS is ignored once the axon plugin is "
                        "present; this uses jax.config)")
    p.add_argument("--budget_s", type=float, default=None,
                   help="wall-clock budget: skip remaining timed repeats "
                        "when fewer than ~1.2 repeat-times remain")
    p.add_argument("--record", type=str, default="reports/bench_last.json",
                   help="round-local result cache re-emitted as a "
                        "provisional line at startup (see module docstring)")
    p.add_argument("--no_record", action="store_true",
                   help="neither read nor write --record")
    args = p.parse_args()

    t_start = time.time()
    install_signal_flush()
    sig = result_signature(args)
    rec_path = None if args.no_record else args.record
    if rec_path:
        emit_cached_record(rec_path, sig)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_pc_sampler, pick_chunk
    from text2protein_tpu.models import build_model

    if args.metric == "featurize":
        bench_featurize(args)
        return
    if args.metric == "train":
        bench_train(args)
        return

    if args.quick:
        cfg_dict = {
            "data": {"max_res_num": 16, "num_channels": 5},
            "model": {"condition": ["length"], "nf": 8, "ch_mult": [1, 2],
                      "num_res_blocks": 1, "attn_resolutions": [8],
                      "n_heads": 2, "context_dim": 16, "num_scales": 100},
        }
        args.steps = min(args.steps, 100)
        args.batch = min(args.batch, 2)
    else:
        cfg_dict = args.config
    config = load_config(cfg_dict)
    config.model.dtype = args.dtype
    if args.norm_dtype:
        config.model.norm_dtype = args.norm_dtype

    b = args.batch
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
    if args.param_dtype == "bfloat16":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    # length condition: all samples at L=128 (the metric's shape)
    lengths = np.full((b,), min(128, n), np.int32)
    v = np.zeros((b, n, n), bool)
    for i, l in enumerate(lengths):
        v[i, :l, :l] = True
    condition = {"length": jnp.asarray(v)}

    if args.sampler == "hybrid":
        from text2protein_tpu.diffusion.ode import get_hybrid_sampler

        sampler = get_hybrid_sampler(
            sde, model, (b, n, n, c),
            snr=config.sampling.snr,
            n_steps=config.sampling.n_steps_each,
            denoise=config.sampling.noise_removal,
            eps=eps,
            chunk_size=args.chunk or (50 if n >= 256 else None),
        )
    else:
        sampler = get_pc_sampler(
            sde, model, (b, n, n, c),
            predictor=config.sampling.predictor,
            corrector=config.sampling.corrector,
            snr=config.sampling.snr,
            n_steps=config.sampling.n_steps_each,
            denoise=config.sampling.noise_removal,
            eps=eps,
            num_steps=args.steps,
            # single device executions are wall-clock-capped on the tunnel
            # platform; chunk long trajectories into multiple launches (the
            # N=256 model needs much smaller chunks than L=128)
            chunk_size=args.chunk or pick_chunk(args.steps, 100 if n >= 256
                                                else 1000),
        )

    # compile + warm run (materialize on host: on the axon tunnel platform
    # block_until_ready alone does not guarantee completion)
    out, nfe = sampler(params, jax.random.PRNGKey(0), condition=condition,
                       context=context, context_mask=context_mask)
    np.asarray(out)

    n_chips = jax.local_device_count()
    baseline = 25.0  # BASELINE.json north star
    if args.sampler == "hybrid":
        metric = f"L{n}_samples_per_min_per_chip_hybrid_nfe{int(nfe)}"
    else:
        metric = f"L{n}_samples_per_min_per_chip_at_{args.steps}_pc_steps"

    def make_result(dt, provisional=False):
        spm = b / dt * 60.0 / n_chips
        res = {
            "metric": metric,
            "value": round(spm, 3),
            "unit": "samples/min/chip",
            # hybrid runs a different NFE budget than the north-star metric
            "vs_baseline": (None if args.sampler == "hybrid"
                            else round(spm / baseline, 3)),
        }
        if provisional:
            res["provisional"] = True
        return res

    times = []
    out_host = None
    for r in range(args.repeats):
        if times and args.budget_s is not None:
            projected = time.time() - t_start + 1.2 * min(times)
            if projected > args.budget_s:
                print(f"# budget_s={args.budget_s} nearly spent after "
                      f"{len(times)} repeat(s); skipping the rest",
                      file=sys.stderr)
                break
        t0 = time.perf_counter()
        out, nfe = sampler(params, jax.random.PRNGKey(r + 1),
                           condition=condition, context=context,
                           context_mask=context_mask)
        out_host = np.asarray(out)  # host transfer = true device sync
        times.append(time.perf_counter() - t0)
        if r == 0 and args.repeats > 1:
            # first real steady-state measurement: get a parseable line out
            # before the remaining repeats risk the driver's timeout
            emit(make_result(times[0], provisional=True))

    assert np.isfinite(out_host).all(), "sampler produced non-finite values"
    dt = min(times)
    result = make_result(dt)
    emit(result)
    if rec_path:
        write_record(rec_path, sig, result)
    print(
        f"# batch={b} steps={args.steps} nfe={int(nfe)} time={dt:.2f}s "
        f"repeats={len(times)} platform={jax.devices()[0].platform} "
        f"chips={n_chips}",
        file=sys.stderr,
    )


def bench_featurize(args):
    """On-device batched 6D featurization throughput (structs/sec). The
    reference featurizes on the host via a multiprocessing pool only
    (`/root/reference/dataset.py:106-112`)."""
    import jax
    import jax.numpy as jnp

    from text2protein_tpu.data.featurize import get_coords6d_jax

    L = 128
    b = 512 if not args.quick else 16
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(b, L, 3, 3).astype(np.float32) * 8.0)

    feat = jax.jit(jax.vmap(get_coords6d_jax))
    np.asarray(feat(xyz))  # compile + warm
    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        out = feat(xyz)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    structs_per_sec = b / dt
    emit({
        "metric": f"on_device_6d_featurize_L{L}_structs_per_sec",
        "value": round(structs_per_sec, 1),
        "unit": "structs/sec",
        "vs_baseline": None,
    })
    print(f"# batch={b} time={dt * 1000:.1f}ms", file=sys.stderr)


def bench_train(args):
    """Training-step throughput (samples/sec/chip) + MFU on the flagship
    config (tiny shapes with --quick)."""
    import jax
    import jax.numpy as jnp

    from text2protein_tpu.config import load_config
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.models import build_model
    from text2protein_tpu.training import create_train_state, make_train_step

    if args.quick:
        config = load_config({
            "data": {"max_res_num": 16, "num_channels": 5},
            "model": {"condition": ["length"], "nf": 8, "ch_mult": [1, 2],
                      "num_res_blocks": 1, "attn_resolutions": [8],
                      "n_heads": 2, "context_dim": 16, "num_scales": 100},
        })
        args.batch = min(args.batch, 2)
    else:
        config = load_config(args.config)
    config.model.dtype = args.dtype
    if args.norm_dtype:
        config.model.norm_dtype = args.norm_dtype
    if args.remat_resblocks:
        config.model.remat_resblocks = True
    b = args.batch
    n = config.data.max_res_num
    c = config.data.num_channels

    rng = np.random.RandomState(0)
    ln = min(128, n)
    mask = np.zeros((b, n, n), bool)
    mask[:, :ln, :ln] = True
    coords = rng.uniform(-1, 1, (b, n, n, c)).astype(np.float32) * mask[..., None]
    coords[..., -1] = mask
    batch = {
        "coords_6d": jnp.asarray(coords),
        "mask_pair": jnp.asarray(mask),
        "ss_spans": jnp.full((b, 32, 2), -1, jnp.int32),
        "length": jnp.full((b,), ln, jnp.int32),
        "context": jnp.asarray(
            rng.randn(b, 64, config.model.context_dim).astype(np.float32)
        ),
        "context_mask": jnp.asarray(np.ones((b, 64), bool)),
    }

    sde, _ = get_sde(config)
    model = build_model(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    k = max(1, int(args.steps_per_launch))
    if k > 1:
        # the production path (training.steps_per_launch): K steps fused in
        # one lax.scan launch — amortizes the tunnel's per-launch dispatch
        # and sync, which dominates single-step timings on this platform
        from text2protein_tpu.training import make_multi_train_step

        # donate like production training does: without donation the input
        # and output train states coexist, which alone OOMs the N=256
        # nf=256 config (state is ~4G; 15.96G needed vs 15.75G HBM)
        multi = make_multi_train_step(config, sde, model, donate=True)
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), batch
        )
        step = lambda s, b_, r: multi(s, b_, r)  # noqa: E731
        run_batch = stacked
    else:
        step = make_train_step(config, sde, model, donate=True)
        run_batch = batch
    state, loss = step(state, run_batch, jax.random.PRNGKey(1))
    np.asarray(loss)  # sync

    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        state, loss = step(state, run_batch, jax.random.PRNGKey(r + 2))
        np.asarray(loss)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # XLA's own FLOP count for one train step (fwd+bwd+optimizer). Always
    # taken from the SINGLE-step program: cost_analysis counts a lax.scan
    # body ONCE regardless of trip count, so lowering the fused k-step
    # program would under-report the launch FLOPs by exactly k. MFU is
    # MODEL-flops utilization, so the cost model must come from the
    # non-remat program — remat recompute is overhead, not useful work
    # (counting it reported a nonsense 114% at B=8 --remat_resblocks).
    # This block runs AFTER the timing loop: the throwaway cost state it
    # materializes (~4G for the N=256 model) must not coexist with the
    # timed launches' activations.
    step_flops = None
    try:
        cost_model = model
        cost_batch, bc = batch, b
        if getattr(config.model, "remat_resblocks", False):
            import dataclasses

            cost_model = dataclasses.replace(model, remat_resblocks=False)
            # the non-remat program at the full batch may not fit HBM for
            # AOT compilation (that's why remat is on); FLOPs are linear in
            # batch, so cost a 2-sample program and scale.
            bc = min(b, 2)
            cost_batch = jax.tree.map(lambda x: x[:bc], batch)
            del state  # free the exec train state before materializing
            cost_state = create_train_state(
                config, cost_model, jax.random.PRNGKey(0), cost_batch)
        else:
            cost_state = state
        single = make_train_step(config, sde, cost_model, donate=False)
        cost = jax.jit(single).lower(
            cost_state, cost_batch, jax.random.PRNGKey(1)).compile()
        ca = cost.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca["flops"]) * k * (b / bc)
    except Exception as e:
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    n_chips = jax.local_device_count()
    # MFU vs TPU v5e peak (197 TFLOP/s bf16; f32 runs the MXU at half rate)
    peak = 197e12 if args.dtype == "bfloat16" else 98.5e12
    mfu = step_flops / dt / (peak * n_chips) if step_flops else None
    emit({
        "metric": f"L{n}_train_samples_per_sec_per_chip",
        "value": round(b * k / dt / n_chips, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
    })
    print(
        f"# batch={b} steps_per_launch={k} launch_time={dt * 1000:.1f}ms"
        + (f" launch_flops={step_flops:.3e} MFU={100 * mfu:.1f}%"
           if mfu else ""),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
