"""Worker process for the 2-process multi-host training test.

Launched by tests/test_multihost.py with `python multihost_worker.py
<process_id> <num_processes> <coordinator_port>`. Each process simulates one
host with 2 virtual CPU devices; the global mesh is dp=2 x model=2 across 4
devices spanning both processes — the TPU-pod layout `cli/train.py --multihost`
drives (the reference's multi-GPU spawn path is dead code,
`/root/reference/train.py:259-266`).

Prints `LOSSES <json list>` so the parent can assert both processes computed
identical globally-reduced losses.
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
# The persistent compile cache makes the two workers' compile timelines
# diverge (one hits entries the other misses), which blows gloo's fixed
# 30 s clique-rendezvous deadline; with the cache off both workers compile
# the same graphs in lockstep on the shared core.
os.environ["TEXT2PROTEIN_NO_JAX_CACHE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text2protein_tpu.config import load_config  # noqa: E402
from text2protein_tpu.diffusion import get_sde  # noqa: E402
from text2protein_tpu.models import build_model  # noqa: E402
from text2protein_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from text2protein_tpu.training import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from text2protein_tpu.training.steps import shard_train_state  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, len(jax.devices())

# Gloo's cross-process clique rendezvous has a FIXED 30 s deadline, and
# JAX's async dispatch lets a faster worker race several collectives ahead
# of the other (observed: worker0 blocked creating 8-device clique #4 while
# worker1 was still at its first 4-device clique — cross-deadlock, both
# die at 30 s). Bound the skew: a barrier before any real work, and
# block_until_ready + a barrier after each compile-heavy phase below.
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("worker-start")

N, C, B_LOCAL = 16, 5, 4
config = load_config({
    "training": {"sde": "vesde", "batch_size": B_LOCAL * nproc},
    "data": {"min_res_num": 8, "max_res_num": N, "num_channels": C},
    "model": {
        "condition": ["length"], "nf": 8, "ch_mult": [1, 2],
        "num_res_blocks": 1, "attn_resolutions": [8], "n_heads": 2,
        "context_dim": 16, "num_scales": 100, "dropout": 0.0,
    },
    "optim": {"warmup": 10},
    "seed": 0,
})

# dp=2 x model=2 over 4 global devices; the data axis spans both processes
mesh = make_mesh(2, 2)

def local_batch(step):
    """This host's slice of the global batch (per-host data loading)."""
    rng = np.random.RandomState(1000 * step + pid)
    mask = np.zeros((B_LOCAL, N, N), bool)
    lengths = rng.randint(8, N + 1, B_LOCAL)
    for i, l in enumerate(lengths):
        mask[i, :l, :l] = True
    coords = rng.uniform(-1, 1, (B_LOCAL, N, N, C)).astype(np.float32)
    coords *= mask[..., None]
    coords[..., -1] = mask
    return {
        "coords_6d": coords,
        "mask_pair": mask,
        "ss_spans": np.full((B_LOCAL, 4, 2), -1, np.int32),
        "length": lengths.astype(np.int32),
        "context": rng.randn(B_LOCAL, 4, 16).astype(np.float32),
        "context_mask": np.ones((B_LOCAL, 4), bool),
    }

sde, _ = get_sde(config)
model = build_model(config)
init_batch = shard_batch(mesh, local_batch(0))
state = create_train_state(config, model, jax.random.PRNGKey(0), init_batch)
jax.block_until_ready(state.params)
multihost_utils.sync_global_devices("after-init")
state = shard_train_state(state, mesh)
jax.block_until_ready(state.params)
multihost_utils.sync_global_devices("after-shard")
train_step = make_train_step(config, sde, model, mesh=mesh, donate=False)

losses = []
for step in range(3):
    dbatch = shard_batch(mesh, local_batch(step))
    state, loss = train_step(state, dbatch, jax.random.PRNGKey(42))
    losses.append(float(loss))  # per-step host sync keeps the hosts in step

assert all(np.isfinite(losses)), losses
print("LOSSES", json.dumps(losses), flush=True)
