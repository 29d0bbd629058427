"""Train state: params + optimizer + EMA + step, as one PyTree.

Replaces the reference's mutable dict of torch objects
(`/root/reference/train.py:105-116`) with a flax.struct dataclass updated
functionally inside one jitted step. Optimizer matches
`/root/reference/score_sde_pytorch/losses.py:26-51`: Adam(lr, betas=(beta1,
0.999), eps), linear lr warmup `step/warmup`, global-norm grad clip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion.ema import EMAState, ema_init


@struct.dataclass
class TrainState:
    step: jnp.ndarray          # int32 scalar
    params: dict
    opt_state: optax.OptState
    ema: EMAState


def build_optimizer(config) -> optax.GradientTransformation:
    o = config.optim
    assert o.optimizer == "Adam", f"optimizer {o.optimizer} not supported"
    warmup = max(int(o.warmup), 0)
    if warmup > 0:
        schedule = optax.linear_schedule(0.0, o.lr, warmup)
    else:
        schedule = o.lr
    chain = []
    if o.grad_clip is not None and o.grad_clip >= 0:
        chain.append(optax.clip_by_global_norm(o.grad_clip))
    chain.append(
        optax.adamw(
            schedule,
            b1=o.beta1,
            b2=0.999,
            eps=o.eps,
            weight_decay=o.weight_decay,
        )
        if o.weight_decay
        else optax.adam(schedule, b1=o.beta1, b2=0.999, eps=o.eps)
    )
    return optax.chain(*chain)


def create_train_state(config, model, rng, sample_batch) -> TrainState:
    """Initialize params/opt/EMA from one example batch (NHWC arrays). Light
    batches (data.featurize_on_device) carry no coords_6d; init shapes come
    from the config instead."""
    x = sample_batch.get("coords_6d")
    if x is None:
        b = sample_batch["length"].shape[0]
        n = int(config.data.max_res_num)
        x = jnp.zeros((b, n, n, int(config.data.num_channels)), jnp.float32)
    t = jnp.zeros((x.shape[0],), jnp.float32)
    ctx = sample_batch.get("context")
    ctx_mask = sample_batch.get("context_mask")
    variables = model.init(
        {"params": rng}, x, t, context=ctx, context_mask=ctx_mask, train=False
    )
    params = variables["params"]
    tx = build_optimizer(config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=ema_init(params, decay=config.model.ema_rate),
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
