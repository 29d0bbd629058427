"""Device mesh + sharding helpers.

The reference's only parallelism is single-process `torch.nn.DataParallel`
(`/root/reference/score_sde_pytorch/utils.py:8`). The TPU-native design: a
`jax.sharding.Mesh` with ('data', 'model') axes; the batch is sharded over
'data' (DP — XLA inserts the gradient all-reduce over ICI), and parameters are
optionally sharded over 'model' (FSDP-style) on their largest divisible axis.
Multi-host runs extend the same mesh across hosts (`jax.distributed`).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 means all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence-parallel analog for the (B, N, N, ...) pair grid: batch over
    'data' AND the row axis over 'model'. XLA SPMD inserts halo exchanges for
    the convolutions and the gather/reduce collectives for attention — the
    scaling path for residue counts beyond one chip's HBM (a capability the
    reference lacks entirely, SURVEY.md §5 long-context)."""
    return NamedSharding(mesh, P("data", "model"))


def batch_shardings(mesh: Mesh, batch, shard_grid: bool = False):
    """Per-key shardings for a training batch dict."""
    grid = grid_sharding(mesh) if shard_grid else batch_sharding(mesh)
    data = batch_sharding(mesh)

    def pick(k):
        return grid if k in ("coords_6d", "mask_pair", "mask_inpaint") else data

    return {k: pick(k) for k in batch}


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_array(value, sharding):
    """Place a host array under a sharding. Multi-process: the host array is
    this process's share of the global batch (each host loads its slice of
    the index space, data/loader.py host_id), assembled into one global
    jax.Array — the TPU-pod analog of the reference's nonexistent DDP path."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(value)
        )
    return jax.device_put(value, sharding)


def shard_batch(mesh: Mesh, batch, shard_grid: bool = False):
    """Place a batch dict on the mesh; optionally shard the pair-grid row
    axis over 'model' (sequence parallel)."""
    if isinstance(batch, dict):
        shardings = batch_shardings(mesh, batch, shard_grid=shard_grid)
        return {k: put_array(v, shardings[k]) for k, v in batch.items()}
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: put_array(x, s), batch)


def param_spec(path_unused, x, model_axis_size: int) -> P:
    """FSDP-style spec: shard the largest divisible axis over 'model'."""
    if model_axis_size <= 1 or x.ndim == 0:
        return P()
    sizes = list(x.shape)
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    for i in order:
        if sizes[i] % model_axis_size == 0 and sizes[i] >= 2 * model_axis_size:
            spec = [None] * len(sizes)
            spec[i] = "model"
            return P(*spec)
    return P()


def shard_params(mesh: Mesh, params):
    """Apply FSDP-style parameter sharding over the 'model' axis."""
    msize = mesh.shape["model"]

    def place(x):
        return put_array(x, NamedSharding(mesh, param_spec(None, x, msize)))

    return jax.tree.map(place, params)


def params_shardings(mesh: Mesh, params):
    """The NamedSharding pytree matching `shard_params` (for jit in/out specs)."""
    msize = mesh.shape["model"]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, param_spec(None, x, msize)), params
    )
