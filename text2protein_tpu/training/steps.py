"""Jitted train/eval step builders with mesh sharding.

One `jit` covers loss + backward + clip + Adam + EMA (the reference splits
these across Python in `/root/reference/score_sde_pytorch/losses.py:154-184`).
Batches are sharded over the mesh 'data' axis; XLA inserts the gradient
all-reduce over ICI. Eval uses the EMA parameters (the reference's
store/copy_to/restore swap collapses to just passing state.ema.params).
"""

from __future__ import annotations

import jax

from ..diffusion.ema import ema_update
from ..diffusion.losses import get_sde_loss_fn
from .state import TrainState, build_optimizer
from ..parallel.mesh import batch_sharding, replicate_sharding, params_shardings


def _featurizer(config):
    """Identity, or the on-device light-batch -> full-batch transform
    (data.featurize_on_device; see conditioning.batch_to_device_arrays)."""
    if not config.data.get("featurize_on_device", False):
        return lambda batch: batch

    from ..data.featurize import featurize_batch_jax

    num_channels = int(config.data.num_channels)

    def featurize(batch):
        if "coords_6d" in batch:  # already featurized (e.g. tests)
            return batch
        coords_6d, mask_pair = featurize_batch_jax(
            batch["bb"], batch["mask_res"], num_channels,
            ss_block=batch.get("ss_block"),
        )
        out = dict(batch)
        out["coords_6d"] = coords_6d
        out["mask_pair"] = mask_pair
        return out

    return featurize


def _make_one_step(config, sde, model):
    """The single training step (featurize -> loss/grad -> optimizer -> EMA),
    shared by the single-step and fused multi-step builders so their
    semantics cannot diverge."""
    loss_fn = get_sde_loss_fn(
        sde, model, train=True, condition=tuple(config.model.condition),
        context_dropout=float(config.model.get("context_dropout", 0.0)),
    )
    tx = build_optimizer(config)
    featurize = _featurizer(config)

    def step_fn(state: TrainState, batch, rng):
        batch = featurize(batch)
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema=ema_update(state.ema, new_params),
        )
        return new_state, loss

    return step_fn


def make_train_step(config, sde, model, mesh=None, donate=True,
                    shard_grid=False):
    """Returns train_step(state, batch, rng) -> (state, loss). With
    `shard_grid`, the (B, N, N, *) arrays additionally shard their row axis
    over the mesh 'model' axis (sequence parallel)."""
    step_fn = _make_one_step(config, sde, model)

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_argnums)
    if shard_grid:
        # per-key shardings come from shard_batch(…, shard_grid=True)
        # placements; jit infers them from the input arrays.
        return jax.jit(step_fn, donate_argnums=donate_argnums)
    return jax.jit(
        step_fn,
        donate_argnums=donate_argnums,
        in_shardings=(None, batch_sharding(mesh), replicate_sharding(mesh)),
    )


def make_multi_train_step(config, sde, model, mesh=None, donate=True):
    """Returns multi_step(state, stacked_batches, rng) -> (state, losses).

    `stacked_batches` holds K whole batches stacked on a leading axis
    ((K, B, ...) leaves); the K train steps run as one `lax.scan` inside a
    single device launch. Over a high-latency host<->device link (the axon
    TPU tunnel) this amortizes per-launch dispatch + sync across K steps —
    combined with `data.featurize_on_device` it turns a transfer-bound
    training loop back into a compute-bound one. Semantics match calling
    make_train_step's step K times with fresh per-step rngs (each step's key
    is split from `rng` and folded with its own state.step).
    """
    step_fn = _make_one_step(config, sde, model)

    def one_step(state: TrainState, batch_rng):
        batch, rng = batch_rng
        return step_fn(state, batch, rng)

    def multi_step(state: TrainState, stacked, rng):
        k = jax.tree.leaves(stacked)[0].shape[0]
        rngs = jax.random.split(rng, k)
        return jax.lax.scan(one_step, state, (stacked, rngs))

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(multi_step, donate_argnums=donate_argnums)
    from jax.sharding import NamedSharding, PartitionSpec as P

    stacked_sharding = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        multi_step,
        donate_argnums=donate_argnums,
        in_shardings=(None, stacked_sharding, replicate_sharding(mesh)),
    )


def make_eval_step(config, sde, model, mesh=None):
    """Returns eval_step(state, batch, rng) -> loss, computed with EMA params
    (`/root/reference/score_sde_pytorch/losses.py:176-183`)."""
    loss_fn = get_sde_loss_fn(
        sde, model, train=False, condition=tuple(config.model.condition)
    )
    featurize = _featurizer(config)

    def step_fn(state: TrainState, batch, rng):
        return loss_fn(state.ema.params, featurize(batch), rng)

    if mesh is None:
        return jax.jit(step_fn)
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_sharding(mesh), replicate_sharding(mesh)),
    )


def shard_train_state(state: TrainState, mesh) -> TrainState:
    """Place params/opt/EMA on the mesh (FSDP over 'model' where divisible,
    replicated over 'data')."""
    from jax.sharding import NamedSharding
    from ..parallel.mesh import param_spec, put_array

    msize = mesh.shape["model"]

    def place(x):
        return put_array(x, NamedSharding(mesh, param_spec(None, x, msize)))

    # Adam mu/nu share param shapes, so the same FSDP rule applies leaf-wise;
    # scalars (step, count) land replicated via the P() fallback.
    return jax.tree.map(place, state)
