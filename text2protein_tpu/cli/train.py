"""Training CLI — `python -m text2protein_tpu.cli.train <config> [...]`.

Same workflow as `/root/reference/train.py:22-266`: config -> dataset 95/5
split -> train loop with per-epoch eval, preemption checkpoint, best-loss
checkpoints, optional snapshot sampling — re-architected around one jitted
sharded train step and host-side data loading.
"""

from __future__ import annotations

import argparse
import pickle
import time
from datetime import datetime
from pathlib import Path

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="Train the score model")
    p.add_argument("config", type=str)
    p.add_argument("--resume", type=str, default=None,
                   help="workdir to resume from (reference --resume)")
    p.add_argument("--local_test", action="store_true",
                   help="cap dataset at 200 records")
    p.add_argument("--workdir_root", type=str, default="training")
    p.add_argument("--max_steps", type=int, default=None,
                   help="override training.n_iters (smoke runs)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() for multi-host pods")
    return p


def split_dataset(n, seed, eval_frac=0.05):
    """95/5 split with a fixed seed (`/root/reference/train.py:44-51`)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_eval = max(1, int(n * eval_frac))
    return perm[n_eval:], perm[:n_eval]


def batches(dataset, indices, batch_size, max_len, rng, shuffle=True,
            drop_last=True, host_id=0, host_count=1):
    """Background-prefetched epoch batches (data/loader.PrefetchLoader)."""
    from ..data.loader import PrefetchLoader

    loader = PrefetchLoader(
        dataset, indices, batch_size, max_len,
        seed=int(rng.randint(2**31)), shuffle=shuffle, drop_last=drop_last,
        host_id=host_id, host_count=host_count,
    )
    yield from loader


def make_eval_pass(config, dataset, eval_idx, bs, max_len, prepare, eval_step):
    """Deterministic eval boundaries (round-4 verdict: `avg_eval_loss` was
    dominated by fresh (t, z, mask) draws each boundary — noise swamped real
    improvements on a small split and froze best_eval at an early lucky
    minimum, making one of the reference's three checkpoint artifacts
    (`/root/reference/train.py:244-255`) decorative at flagship scale).

    The (t, z, conditioning-mask) keys are a fixed per-batch grid seeded once
    from config.seed, and the eval index order is fixed, so two eval passes
    at the same params return bit-identical losses and boundary-to-boundary
    deltas measure the params, not the noise. The train path is untouched.
    """
    import jax

    base = jax.random.PRNGKey(config.seed + 7919)
    if len(eval_idx) < bs:
        # under one batch: fill by sampling with replacement ONCE (the
        # reference samples with replacement per boundary, train.py:66-72)
        idx = np.random.RandomState(config.seed + 17).choice(
            eval_idx, size=bs, replace=True)
    else:
        idx = np.asarray(eval_idx)

    def eval_pass(state):
        losses, last_batch = [], None
        loader_rng = np.random.RandomState(config.seed + 23)
        for bi, batch in enumerate(
                batches(dataset, idx, bs, max_len, loader_rng,
                        shuffle=False, drop_last=True)):
            k_mask, k_step = jax.random.split(
                jax.random.fold_in(base, bi))
            dbatch = prepare(batch, k_mask)
            losses.append(float(eval_step(state, dbatch, k_step)))
            last_batch = batch
        return (float(np.mean(losses)) if losses else np.inf), last_batch

    return eval_pass


def fetch_state_chunked(state, log_every_s=20.0):
    """Device->host copy of the train state, leaf by leaf with progress
    prints (round-4 verdict: the monolithic `jax.device_get(state)` blocked
    silently for ~7 min at N=256 over the ~3 MB/s tunnel, and a dead RPC
    inside it once froze the trainer until the supervisor's 45-min save
    watchdog fired — 33 min lost). Individual leaves cross in seconds, so a
    healthy transfer refreshes the log continuously and the supervisor can
    kill a genuinely-stalled transfer on a tight limit
    (`scripts/train_supervised.sh` TRANSFER_STALL_S) instead of absorbing it.
    """
    import jax

    leaves, treedef = jax.tree.flatten(state)
    total = sum(getattr(x, "nbytes", 0) for x in leaves)
    done, t0 = 0, time.time()
    t_log = t0
    out = []
    for i, leaf in enumerate(leaves):
        out.append(jax.device_get(leaf))
        done += getattr(leaf, "nbytes", 0)
        if time.time() - t_log >= log_every_s:
            t_log = time.time()
            print(f"state transfer {done / 2**20:.0f}/"
                  f"{total / 2**20:.0f} MiB ({i + 1}/{len(leaves)} leaves, "
                  f"{time.time() - t0:.0f}s)", flush=True)
    return jax.tree.unflatten(treedef, out)


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import load_config, save_config
    from ..conditioning import batch_to_device_arrays, get_condition_from_batch
    from ..data import ProteinProcessedDataset
    from ..diffusion import get_sde
    from ..diffusion.sampling import get_sampling_fn
    from ..models import build_model
    from ..parallel.mesh import make_mesh, shard_batch
    from ..text import build_text_encoder
    from ..training import (
        CheckpointManager,
        create_train_state,
        make_train_step,
        make_eval_step,
        make_multi_train_step,
    )
    from ..training.state import param_count
    from ..training.steps import shard_train_state
    from ..utils.logging import MetricsWriter

    # Multi-host: the same mesh spans all hosts; each host loads its shard of
    # the index space (the reference's multi-GPU spawn path is dead code,
    # `/root/reference/train.py:259-266`).
    import os as _os

    if args.multihost or "COORDINATOR_ADDRESS" in _os.environ:
        jax.distributed.initialize()
    host_id, host_count = jax.process_index(), jax.process_count()

    config = load_config(args.config)
    if args.local_test:
        config.training.batch_size = min(config.training.batch_size, 2)

    # Workdir: training/{config}/{timestamp} (`/root/reference/train.py:75-95`)
    cfg_name = Path(args.config).stem
    if args.resume:
        workdir = Path(args.resume)
    else:
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        workdir = Path(args.workdir_root) / cfg_name / stamp
    workdir.mkdir(parents=True, exist_ok=True)
    save_config(config, workdir / "config.yml")

    # Data
    dataset = ProteinProcessedDataset(config.data.processed_dataset_path)
    if args.local_test:
        dataset.data_paths = dataset.data_paths[:200]
    n_total = len(dataset)
    assert n_total >= 2, f"no records in {config.data.processed_dataset_path}"
    train_idx, eval_idx = split_dataset(n_total, config.seed)
    (workdir / "train_ids.txt").write_text(
        "\n".join(dataset.data_paths[i].split(".")[0] for i in train_idx)
    )
    (workdir / "test_ids.txt").write_text(
        "\n".join(dataset.data_paths[i].split(".")[0] for i in eval_idx)
    )

    # Mesh + model + state. The data axis must divide the batch; use the
    # largest compatible divisor of the available devices.
    import math as _math

    n_dev = len(jax.devices())
    model_axis = max(int(config.mesh.model), 1)
    data_req = (
        int(config.mesh.data)
        if int(config.mesh.data) != -1
        else n_dev // model_axis
    )
    data_axis = _math.gcd(config.training.batch_size, data_req)
    mesh = make_mesh(
        data_axis, model_axis,
        devices=jax.devices()[: data_axis * model_axis],
    )
    sde, sampling_eps = get_sde(config)
    model = build_model(config)
    encoder = build_text_encoder(config)

    host_rng = np.random.RandomState(config.seed)
    bs = config.training.batch_size
    max_len = config.data.max_res_num

    def prepare(batch, rng_key):
        arrays = batch_to_device_arrays(batch, config, rng=rng_key)
        emb, emb_mask = encoder.encode(batch["caption"])
        arrays["context"] = jnp.asarray(emb)
        arrays["context_mask"] = jnp.asarray(emb_mask)
        return shard_batch(mesh, arrays)

    def prepare_host(batch, rng_key):
        """Host-side (numpy) variant for the fused multi-step path: K batches
        are stacked and cross the link as ONE transfer."""
        arrays = batch_to_device_arrays(batch, config, rng=rng_key,
                                        device=False)
        emb, emb_mask = encoder.encode(batch["caption"])
        arrays["context"] = np.asarray(emb)
        arrays["context_mask"] = np.asarray(emb_mask)
        return arrays

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import put_array

    stacked_sharding = NamedSharding(mesh, P(None, "data"))

    def prepare_stacked(group, rng_keys):
        hosts = [prepare_host(b, k) for b, k in zip(group, rng_keys)]
        # caption token counts land in per-batch buckets (text encoders pad
        # to the batch max's bucket); pad every batch in the group to the
        # group's widest bucket so the K batches stack
        t_max = max(h["context"].shape[1] for h in hosts)
        for h in hosts:
            t = h["context"].shape[1]
            if t < t_max:
                h["context"] = np.pad(h["context"],
                                      ((0, 0), (0, t_max - t), (0, 0)))
                h["context_mask"] = np.pad(h["context_mask"],
                                           ((0, 0), (0, t_max - t)))
        stacked = {
            k: np.stack([h[k] for h in hosts]) for k in hosts[0]
        }
        return {k: put_array(v, stacked_sharding) for k, v in stacked.items()}

    # ---- resident prep path (featurize_on_device + fused launches):
    # featurization and caption-context lookup run as their OWN device launch,
    # so the fused K-step train program is exactly the bench's (which fits
    # B=8 + remat at N=256; featurize folded into the scan OOM'd it by 213M),
    # and the per-launch host->device transfer drops from ~21 MB of f32
    # context embeddings (7 s at the tunnel's ~3 MB/s) to ~1 MB of backbone
    # coords + int32 record indices. The per-record caption embeddings are
    # encoded ONCE at startup and kept on device as a bf16 table, DEDUP'D by
    # caption text: the table holds one row per UNIQUE caption plus an
    # (n_records,) int32 indirection — synthetic corpora have O(10) unique
    # captions (the 2304-record N=256 corpus would otherwise cost 302 MB of
    # HBM on a chip where the 379M-param B=8 train program already runs
    # close to full), and real-PDB corpora repeat captions heavily too.
    # Guard: cap the UNIQUE-caption table's HBM footprint; past the cap fall
    # back to shipping context per launch.
    resident_prep = bool(config.data.get("featurize_on_device", False))
    max_table = int(config.data.get("max_context_table_bytes", 1 << 30))

    def build_context_table_host():
        uniq = {}
        inv = np.empty(n_total, np.int32)
        for i in range(n_total):
            inv[i] = uniq.setdefault(dataset.caption(i), len(uniq))
        ucaps = list(uniq)
        embs, masks = [], []
        for i in range(0, len(ucaps), 64):
            e, m = encoder.encode(ucaps[i:i + 64])
            embs.append(np.asarray(e))
            masks.append(np.asarray(m))
        t_max = max(e.shape[1] for e in embs)
        embs = [np.pad(e, ((0, 0), (0, t_max - e.shape[1]), (0, 0)))
                for e in embs]
        masks = [np.pad(m, ((0, 0), (0, t_max - m.shape[1]))) for m in masks]
        return (np.concatenate(embs).astype(jnp.bfloat16),
                np.concatenate(masks).astype(bool), inv)

    if resident_prep:
        # size the REAL encoded table (pre-encode estimates undercount when
        # captions span token buckets, advisor r4; dedup makes the encode
        # cheap regardless of record count)
        table_np, mask_np, inv_np = build_context_table_host()
        if table_np.nbytes > max_table:
            print(f"context table is {table_np.nbytes/2**30:.1f} GiB for "
                  f"{table_np.shape[0]} unique captions "
                  f"(> {max_table/2**30:.1f} cap); using per-launch "
                  f"context shipping")
            resident_prep = False
        else:
            print(f"resident context table: {table_np.shape[0]} unique "
                  f"captions, {table_np.nbytes/2**20:.1f} MiB")

    if resident_prep:
        from ..parallel.mesh import replicate_sharding

        ctx_table = put_array(table_np, replicate_sharding(mesh))
        ctx_mask_table = put_array(mask_np, replicate_sharding(mesh))
        ctx_inv = put_array(inv_np, replicate_sharding(mesh))
        from ..data.featurize import featurize_batch_jax

        num_channels = int(config.data.num_channels)

        def _prep(light, table, mask_table, inv):
            k, b_ = light["bb"].shape[:2]
            flat = lambda x: x.reshape((k * b_,) + x.shape[2:])  # noqa: E731
            coords_6d, mask_pair = featurize_batch_jax(
                flat(light["bb"]), flat(light["mask_res"]), num_channels,
                ss_block=(flat(light["ss_block"])
                          if "ss_block" in light else None),
            )
            unflat = lambda x: x.reshape((k, b_) + x.shape[1:])  # noqa: E731
            uidx = inv[light["index"]]
            out = {
                "coords_6d": unflat(coords_6d),
                "mask_pair": unflat(mask_pair),
                "ss_spans": light["ss_spans"],
                "length": light["length"],
                "context": table[uidx].astype(jnp.float32),
                "context_mask": mask_table[uidx],
            }
            if "mask_inpaint" in light:
                out["mask_inpaint"] = light["mask_inpaint"]
            return out

        prep_jit = jax.jit(_prep, out_shardings=stacked_sharding)

        def prepare_stacked_resident(group, rng_keys):
            hosts = []
            for b, k in zip(group, rng_keys):
                arrays = batch_to_device_arrays(b, config, rng=k, device=False)
                arrays["index"] = np.asarray(b["index"], np.int32)
                hosts.append(arrays)
            stacked = {k: np.stack([h[k] for h in hosts]) for k in hosts[0]}
            light = {k: put_array(v, stacked_sharding)
                     for k, v in stacked.items()}
            return prep_jit(light, ctx_table, ctx_mask_table, ctx_inv)

        prepare_stacked = prepare_stacked_resident  # noqa: F811

    first = next(batches(dataset, train_idx, bs, max_len, host_rng,
                         host_id=host_id, host_count=host_count))
    init_batch = prepare(first, jax.random.PRNGKey(0))

    def fresh_state():
        s = create_train_state(config, model,
                               jax.random.PRNGKey(config.seed), init_batch)
        return shard_train_state(s, mesh)

    ckpt = CheckpointManager(workdir)
    if ckpt.has_meta() or args.resume:
        # Restore against an ABSTRACT template built via `jax.eval_shape` —
        # the concrete init state must NEVER be materialized on the resume
        # path. At N=256 the init state (~6 GB) + restored state (~6 GB)
        # fragment HBM enough that the first fused launch OOMs even when the
        # init state is freed before restore (observed: every resume at step
        # 3010 died RESOURCE_EXHAUSTED while cold starts trained for hours).
        from jax.sharding import NamedSharding

        from ..parallel.mesh import param_spec

        msize = mesh.shape["model"]
        shapes = jax.eval_shape(
            lambda: create_train_state(
                config, model, jax.random.PRNGKey(config.seed), init_batch
            )
        )
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=NamedSharding(mesh, param_spec(None, x, msize)),
            ),
            shapes,
        )
        if ckpt.has_meta():
            state = ckpt.restore_meta(abstract)
            print(f"resumed from preemption checkpoint at step "
                  f"{int(state.step)}")
        else:
            # An explicitly resumed workdir with no meta checkpoint: the run
            # was killed before its first preemption save (observed at N=256,
            # where saves are minutes apart). Fall back to the NEWEST best
            # checkpoint rather than silently restarting from step 0.
            try:
                state = ckpt.restore_newest(abstract)
                print(f"no preemption checkpoint; resumed from a best "
                      f"checkpoint at step {int(state.step)}")
            except FileNotFoundError:
                print("no checkpoint in resumed workdir; starting from "
                      "step 0")
                state = fresh_state()
    else:
        state = fresh_state()
    print(f"model params: {param_count(state.params)/1e6:.2f}M  "
          f"mesh: {dict(mesh.shape)}  records: {n_total}")

    train_step = make_train_step(config, sde, model, mesh=mesh)
    eval_step = make_eval_step(config, sde, model, mesh=mesh)
    # Fused multi-step launches (training.steps_per_launch > 1): K steps per
    # device launch via one lax.scan — amortizes the tunnel's per-launch
    # dispatch/sync latency (see training.steps.make_multi_train_step).
    steps_per_launch = max(1, int(config.training.get("steps_per_launch", 1)))
    multi_step = (
        make_multi_train_step(config, sde, model, mesh=mesh)
        if steps_per_launch > 1
        else None
    )

    writer = MetricsWriter(workdir / "tb")
    rng = jax.random.PRNGKey(config.seed + 1)
    best_train, best_eval = np.inf, np.inf
    pending_train = pending_eval = False
    last_best_save = int(state.step)
    # milestone steps still ahead of us (resume-safe: an existing snapshot
    # dir means that milestone was already taken in a previous attempt)
    snap_steps = [
        int(s) for s in config.training.get("snapshot_steps", [])
        if int(s) > int(state.step)
        and not (ckpt.best_dir / f"snapshot_{int(s)}").exists()
    ]
    n_iters = args.max_steps or config.training.n_iters
    log_freq = config.training.log_freq

    step = int(state.step)
    t_last = time.time()
    steps_at_last_log = step
    snapshot_sampling_fn = None
    # step-based cadences (the reference checkpoints/evals every epoch, but
    # its epochs are ~90k records; with small corpora an epoch is seconds —
    # honor the config's step-frequency keys instead)
    meta_freq = max(1, int(config.training.snapshot_freq_for_preemption))
    eval_freq = max(1, int(config.training.eval_freq))
    # per-host steps in one true data pass: each host loads its shard of the
    # index space, so the denominator scales with host_count
    steps_per_epoch = max(1, len(train_idx) // max(bs * host_count, 1))
    max_epoch_steps = int(config.training.epochs) * steps_per_epoch
    step_budget = min(n_iters, max_epoch_steps)
    last_meta = step
    # no immediate boundary at startup/resume: an eval right away triggers
    # best-checkpoint saves that buy ~10 steps of protection for ~25 min of
    # tunnel transfer at N=256 (observed: every resume re-paid it)
    last_eval = step

    def train_batches_forever():
        while True:
            yield from batches(dataset, train_idx, bs, max_len, host_rng,
                               host_id=host_id, host_count=host_count)

    stream = train_batches_forever()
    window_losses = []  # since the last eval boundary
    eval_pass = make_eval_pass(config, dataset, eval_idx, bs, max_len,
                               prepare, eval_step)

    while step < step_budget:
        # ---- train: one device launch (1 or steps_per_launch steps)
        if multi_step is None:
            rng, k_mask, k_step = jax.random.split(rng, 3)
            dbatch = prepare(next(stream), k_mask)
            state, loss = train_step(state, dbatch, k_step)
            new_losses = [float(loss)]
        else:
            k = min(steps_per_launch, max(1, step_budget - step))
            group = [next(stream) for _ in range(k)]
            rng, k_step = jax.random.split(rng)
            rng, *k_masks = jax.random.split(rng, k + 1)
            if k < steps_per_launch:  # tail: reuse the single-step path shape
                new_losses = []
                for b, km in zip(group, k_masks):
                    rng, k_step = jax.random.split(rng)
                    state, loss = train_step(state, prepare(b, km), k_step)
                    new_losses.append(float(loss))
            else:
                dstacked = prepare_stacked(group, k_masks)
                state, losses = multi_step(state, dstacked, k_step)
                new_losses = [float(x) for x in np.asarray(losses)]
        prev_step = step
        step = int(state.step)
        window_losses.extend(new_losses)

        if step // log_freq > prev_step // log_freq:
            dt = time.time() - t_last
            t_last = time.time()
            writer.scalar("training_loss", new_losses[-1], step)
            rate = (step - steps_at_last_log) * bs / max(dt, 1e-9)
            steps_at_last_log = step
            print(f"step {step} loss {new_losses[-1]:.5f} "
                  f"({rate:.1f} samples/s)")

        # ---- preemption checkpoint (`train.py:185`, cadence from
        # training.snapshot_freq_for_preemption)
        if step - last_meta >= meta_freq or step >= step_budget:
            # Meta saves block end-to-end (device->host copy over the tunnel,
            # O(20 min) for the N=256 state) — bracket them in the log so a
            # log-staleness watchdog can tell "long save" from "hung RPC".
            print(f"saving meta checkpoint at step {step} ...")
            t_save = time.time()
            # chunked device->host first: the tunnel-bound copy emits
            # progress lines; orbax then only pays the (fast) disk phase
            ckpt.save_meta(fetch_state_chunked(state))
            print(f"meta checkpoint saved ({time.time() - t_save:.0f}s)")
            last_meta = step

        # ---- eval (EMA-swapped) every eval_freq steps. The reference's test
        # loader samples WITH replacement (`train.py:66-72`), so batches are
        # always full; same here when the eval split is under one batch.
        done = step >= step_budget
        if step - last_eval < eval_freq and not done:
            continue
        last_eval = step
        # bracket the eval in the log: the FIRST boundary compiles the eval
        # program (silent O(15 min) at N=256 over the tunnel) and the
        # supervisor's staleness watchdog must not read that as a hang
        print(f"evaluating at step {step} (first boundary compiles) ...")
        avg_train = float(np.mean(window_losses)) if window_losses else np.inf
        window_losses = []
        writer.scalar("avg_training_loss", avg_train, step)
        avg_eval, last_eval_batch = eval_pass(state)
        if np.isfinite(avg_eval):
            writer.scalar("avg_eval_loss", avg_eval, step)
        epoch = step // steps_per_epoch
        print(f"epoch {epoch}: avg_train {avg_train:.5f} avg_eval {avg_eval:.5f}")

        # ---- snapshot sampling (`train.py:198-222`); the sampler is built
        # once and reused across epochs (one compilation)
        if config.training.snapshot_sampling and last_eval_batch is not None:
            if snapshot_sampling_fn is None:
                shape = (bs, max_len, max_len, config.data.num_channels)
                snapshot_sampling_fn = get_sampling_fn(
                    config, sde, model, shape, sampling_eps
                )
            sampling_fn = snapshot_sampling_fn
            rng, k_cond, k_samp = jax.random.split(rng, 3)
            condition = get_condition_from_batch(config, last_eval_batch,
                                                 rng=k_cond)
            emb, emb_mask = encoder.encode(last_eval_batch["caption"])
            sample, _ = sampling_fn(
                state.ema.params, k_samp, condition=condition,
                context=jnp.asarray(emb), context_mask=jnp.asarray(emb_mask),
            )
            sdir = workdir / "samples" / f"epoch_{epoch}"
            sdir.mkdir(parents=True, exist_ok=True)
            with open(sdir / "sample.pkl", "wb") as f:
                # (B, C, N, N) layout for reference-compatible consumers
                pickle.dump(np.asarray(sample).transpose(0, 3, 1, 2), f)

        # ---- best checkpoints (`train.py:224-255`). One device->host
        # transfer shared by both artifacts: over the ~3 MB/s tunnel the
        # copy IS the cost of a save (~20 min for the N=256 state), and
        # early in training both bests improve at every eval boundary —
        # saving each from the device would pay it twice.
        # best-save throttle: at N=256 each dedup'd best save costs ~7 min of
        # tunnel transfer and early in training BOTH bests improve at every
        # boundary — training.best_save_min_interval (steps, default 0 = off)
        # defers saves that would be superseded a boundary later anyway. An
        # improvement stays PENDING until a boundary where the gap has
        # passed (or the run ends), so a deferred best is never dropped.
        if avg_train < best_train:
            best_train = avg_train
            pending_train = True
        if avg_eval < best_eval:
            best_eval = avg_eval
            pending_eval = True
        best_gap = int(config.training.get("best_save_min_interval", 0))
        save_best_now = (pending_train or pending_eval) and (
            done or step - last_best_save >= best_gap
        )
        # milestone snapshots (training.snapshot_steps): named checkpoints at
        # fixed steps that best/meta overwrites never clobber — e.g. the
        # matched-step corpus-ablation checkpoint at 12000. First boundary at
        # or past each listed step wins; shares the host transfer below.
        due_snaps = [s for s in snap_steps if s <= step]
        if save_best_now or due_snaps:
            # bracket in the log: the transfer blocks silently for ~20 min
            # at N=256, and the supervisor's stall watchdog needs to tell
            # "long save" from "hung RPC" (scripts/train_supervised.sh)
            print(f"saving best checkpoint at step {step} "
                  f"(host transfer) ...")
            t_save = time.time()
            host_state = fetch_state_chunked(state)
            if pending_train:
                ckpt.save_best(host_state, "train")
            if pending_eval:
                ckpt.save_best(host_state, "eval")
            for s in due_snaps:
                print(f"saving milestone snapshot_{s} at step {step}")
                ckpt.save_snapshot(host_state, s)
                snap_steps.remove(s)
            pending_train = pending_eval = False
            last_best_save = step
            del host_state
            print(f"best checkpoint saved ({time.time() - t_save:.0f}s)")

    if last_meta != step:
        ckpt.save_meta(fetch_state_chunked(state))
    ckpt.wait_until_finished()  # join any in-flight async best save
    writer.close()
    print(f"done at step {step}; workdir {workdir}")
    return workdir


if __name__ == "__main__":
    main()
