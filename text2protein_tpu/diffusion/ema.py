"""Exponential moving average of parameters as a PyTree.

Same schedule as the reference (`/root/reference/score_sde_pytorch/models/
ema.py:41-49`): effective decay = min(decay, (1 + n) / (10 + n)). Instead of a
stateful shadow-parameter object with store/copy_to/restore swaps, the EMA
params live in the train state and are updated functionally inside the jitted
step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    decay: float = struct.field(pytree_node=False)
    num_updates: jnp.ndarray = struct.field(default=None)  # int32 scalar
    params: dict = struct.field(default=None)


def ema_init(params, decay: float = 0.999) -> EMAState:
    return EMAState(
        decay=decay,
        num_updates=jnp.zeros((), jnp.int32),
        # Real copies: aliasing the live params would break buffer donation
        # in the jitted train step (same buffer donated twice).
        params=jax.tree.map(jnp.copy, params),
    )


def ema_update(state: EMAState, new_params) -> EMAState:
    n = state.num_updates + 1
    decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - decay
    new_ema = jax.tree.map(
        lambda s, p: s - one_minus * (s - p), state.params, new_params
    )
    return state.replace(num_updates=n, params=new_ema)
