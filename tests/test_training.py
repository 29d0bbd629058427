"""Train step: loss decreases on overfit; EMA warmup; mesh sharding compiles
and executes on the 8-device CPU mesh (SURVEY.md §4e)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2protein_tpu.diffusion import get_sde
from text2protein_tpu.models import build_model
from text2protein_tpu.training import create_train_state, make_train_step, make_eval_step
from text2protein_tpu.training.steps import shard_train_state
from text2protein_tpu.parallel.mesh import make_mesh, shard_batch
from helpers import tiny_config, tiny_batch


def test_train_step_decreases_loss():
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(config, sde, model, donate=False)

    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(30):
        state, loss = train_step(state, batch, rng)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert int(state.step) == 30


def test_ema_warmup_decay():
    """After n updates, effective decay = min(0.999, (1+n)/(10+n)); EMA params
    must lie strictly between init and current params early in training."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    p0 = jax.tree.leaves(state.params)[0].copy()
    train_step = make_train_step(config, sde, model, donate=False)
    state, _ = train_step(state, batch, jax.random.PRNGKey(1))
    assert int(state.ema.num_updates) == 1
    leaf = jax.tree.leaves(state.params)[0]
    ema_leaf = jax.tree.leaves(state.ema.params)[0]
    # decay after 1 update = 2/11; ema = p0 - (1-d)(p0 - p1)
    d = 2.0 / 11.0
    want = p0 - (1 - d) * (p0 - leaf)
    np.testing.assert_allclose(np.asarray(ema_leaf), np.asarray(want), rtol=1e-5, atol=1e-7)


def test_eval_step_uses_ema():
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    eval_step = make_eval_step(config, sde, model)
    l = float(eval_step(state, batch, jax.random.PRNGKey(0)))
    assert np.isfinite(l)


def test_mesh_sharded_train_step():
    """DP over 8 virtual devices: per-device batch slices, replicated params,
    same loss trajectory machinery as single-device."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config, b=8)
    mesh = make_mesh(data=8, model=1)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    state = shard_train_state(state, mesh)
    batch = shard_batch(mesh, batch)
    train_step = make_train_step(config, sde, model, mesh=mesh, donate=False)
    state, loss = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1


def test_mesh_dp_x_fsdp():
    """data=4 x model=2 mesh: params FSDP-sharded over 'model'."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config, b=4)
    mesh = make_mesh(data=4, model=2)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    state = shard_train_state(state, mesh)
    # at least one parameter leaf actually sharded over 'model'
    sharded = [
        x for x in jax.tree.leaves(state.params)
        if not x.sharding.is_fully_replicated
    ]
    assert sharded, "no parameter was sharded over the model axis"
    batch = shard_batch(mesh, batch)
    train_step = make_train_step(config, sde, model, mesh=mesh, donate=False)
    state, loss = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_mesh_sequence_parallel():
    """dp x sp: the pair-grid row axis sharded over 'model'; XLA SPMD
    handles conv halos + attention collectives."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config, b=4)
    mesh = make_mesh(data=4, model=2)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    state = shard_train_state(state, mesh)
    batch = shard_batch(mesh, batch, shard_grid=True)
    assert not batch["coords_6d"].sharding.is_fully_replicated
    train_step = make_train_step(config, sde, model, mesh=mesh, donate=False,
                                 shard_grid=True)
    state, loss = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_sp_matches_dp_loss():
    """Sharding must not change numerics: same batch, same rng -> same loss."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config, b=4)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)

    step_plain = make_train_step(config, sde, model, donate=False)
    _, loss_plain = step_plain(state, batch, jax.random.PRNGKey(5))

    mesh = make_mesh(data=4, model=2)
    state_sp = shard_train_state(state, mesh)
    batch_sp = shard_batch(mesh, batch, shard_grid=True)
    step_sp = make_train_step(config, sde, model, mesh=mesh, donate=False,
                              shard_grid=True)
    _, loss_sp = step_sp(state_sp, batch_sp, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(loss_plain), float(loss_sp), rtol=2e-4)


def test_checkpoint_roundtrip(tmp_path):
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(config, sde, model, donate=False)
    state, _ = train_step(state, batch, jax.random.PRNGKey(1))

    from text2protein_tpu.training import CheckpointManager

    mgr = CheckpointManager(tmp_path)
    mgr.save_meta(state)
    assert mgr.has_meta()
    template = create_train_state(config, model, jax.random.PRNGKey(9), batch)
    restored = mgr.restore_meta(template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_meta_overwrite_is_crash_safe(tmp_path):
    """Re-saving meta must never pass through a state with no valid
    `checkpoint` dir (a preemption mid-save would otherwise lose BOTH the old
    and the new checkpoint), and stale staging dirs from a previous crash
    must not break the next save."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(config, sde, model, donate=False)

    from text2protein_tpu.training import CheckpointManager

    mgr = CheckpointManager(tmp_path)
    mgr.save_meta(state)
    state, _ = train_step(state, batch, jax.random.PRNGKey(1))
    # simulate a stale staging dir left by a crash mid-save
    (mgr.meta_dir / "checkpoint.next").mkdir()
    mgr.save_meta(state)
    assert mgr.has_meta()
    assert not (mgr.meta_dir / "checkpoint.next").exists()
    assert not (mgr.meta_dir / "checkpoint.old").exists()
    template = create_train_state(config, model, jax.random.PRNGKey(9), batch)
    restored = mgr.restore_meta(template)
    assert int(restored.step) == 1


def test_checkpoint_meta_recovers_mid_swap_states(tmp_path):
    """A crash between the two swap renames leaves `checkpoint.next` (newer,
    fully written) and/or `checkpoint.old`; restore must find the newest
    complete one instead of silently restarting from step 0."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    state0 = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(config, sde, model, donate=False)
    state1, _ = train_step(state0, batch, jax.random.PRNGKey(1))

    from text2protein_tpu.training import CheckpointManager

    mgr = CheckpointManager(tmp_path)
    template = create_train_state(config, model, jax.random.PRNGKey(9), batch)

    # crash after _save(staging), before any rename: checkpoint(old step) +
    # checkpoint.next(new step) -> restore the newer .next
    mgr._save(mgr.meta_dir / "checkpoint", state0)
    mgr._save(mgr.meta_dir / "checkpoint.next", state1)
    assert mgr.has_meta()
    assert int(mgr.restore_meta(template).step) == 1

    # crash between target.rename(old) and staging.rename(target):
    # only checkpoint.old + checkpoint.next remain
    import shutil

    (mgr.meta_dir / "checkpoint").rename(mgr.meta_dir / "checkpoint.old")
    assert mgr.has_meta()
    assert int(mgr.restore_meta(template).step) == 1
    shutil.rmtree(mgr.meta_dir / "checkpoint.next")

    # only checkpoint.old left
    assert mgr.has_meta()
    assert int(mgr.restore_meta(template).step) == 0

    # a later successful save supersedes all survivors
    mgr.save_meta(state1)
    assert int(mgr.restore_meta(template).step) == 1


def test_checkpoint_async_best_and_stale_tmp_purge(tmp_path):
    """save_best is async (returns before the disk write commits) but a
    restore or wait joins it; a stale `.orbax-checkpoint-tmp` dir from a
    killed save (observed after a SIGKILL mid-write at N=256) is purged on
    manager init and never treated as a restore source."""
    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)

    from text2protein_tpu.training import CheckpointManager

    mgr = CheckpointManager(tmp_path)
    mgr.save_best(state, "eval")
    mgr.wait_until_finished()
    assert (tmp_path / "checkpoints" / "best_eval").exists()

    # async save then immediate restore_any: the restore must see the
    # committed write (restore joins the in-flight save)
    train_step = make_train_step(config, sde, model, donate=False)
    state2, _ = train_step(state, batch, jax.random.PRNGKey(1))
    mgr.save_best(state2, "eval")
    template = create_train_state(config, model, jax.random.PRNGKey(9), batch)
    restored = mgr.restore_any(template)
    assert int(restored.step) == 1

    # simulate a killed-mid-write tmp leftover; a fresh manager purges it
    stale = tmp_path / "checkpoints" / "best_train.orbax-checkpoint-tmp"
    stale.mkdir()
    (stale / "junk").write_text("partial")
    mgr2 = CheckpointManager(tmp_path)
    assert not stale.exists()
    # best_train itself never committed -> restore_any falls to best_eval
    assert int(mgr2.restore_any(template).step) == 1


def test_checkpoint_restore_newest_and_abstract_template(tmp_path):
    """Resuming training restores the NEWEST checkpoint — best_eval is the
    best MODEL (what samplers want via restore_any), not the newest STATE;
    preferring it for resume threw away 1800 steps of an N=256 run whose
    eval loss had a lucky early minimum. Restore also goes through an
    ABSTRACT template (ShapeDtypeStruct + sharding) so the trainer can free
    the init state's buffers first: two concrete states don't fit HBM at
    N=256."""
    import time

    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(config, sde, model, donate=False)

    from text2protein_tpu.training import CheckpointManager

    mgr = CheckpointManager(tmp_path)
    mgr.save_best(state, "eval")  # step 0, written first
    mgr.wait_until_finished()
    time.sleep(0.1)
    state1, _ = train_step(state, batch, jax.random.PRNGKey(1))
    mgr.save_best(state1, "train")  # step 1, written later
    mgr.wait_until_finished()

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state1,
    )
    restored = mgr.restore_newest(abstract)
    assert int(restored.step) == 1  # the newest state, not best_eval's 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state1.params)[0]),
    )
    # restore_any keeps the sampler-facing preference: best_eval first
    assert int(mgr.restore_any(abstract).step) == 0


@pytest.mark.skipif(
    not os.environ.get("T2P_SLOW_TESTS"),
    reason="~7 min on the 1-core host even warm-cache (SPMD partitioning "
           "of the N=256 grid); run with T2P_SLOW_TESTS=1",
)
def test_sp_long_context_n256():
    """Long-context scaling (SURVEY.md §5): a residue grid 2x the flagship
    (N=256 -> 256x256 pair maps, 4x the cells) trains with the row axis
    sharded over 'model' (sequence-parallel analog). XLA SPMD inserts the
    conv halo exchanges; loss must be finite and the grid inputs actually
    sharded. This is the scaling path the reference lacks entirely — its
    AttnBlockpp materializes the full (HW)^2 logits on one device
    (`/root/reference/score_sde_pytorch/models/layers.py:167-171`)."""
    config = tiny_config(data={"max_res_num": 256, "min_res_num": 192},
                         model={"attn_resolutions": []})
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config, b=2)
    state = create_train_state(config, model, jax.random.PRNGKey(0), batch)

    mesh = make_mesh(data=2, model=4)
    state_sp = shard_train_state(state, mesh)
    batch_sp = shard_batch(mesh, batch, shard_grid=True)
    # the row axis of the pair grid must be split over 'model'
    shard_shapes = {s.data.shape
                    for s in batch_sp["coords_6d"].addressable_shards}
    assert shard_shapes == {(1, 64, 256, 5)}, shard_shapes

    step_sp = make_train_step(config, sde, model, mesh=mesh, donate=False,
                              shard_grid=True)
    state_sp, loss = step_sp(state_sp, batch_sp, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss)), float(loss)
    assert int(state_sp.step) == 1


def test_remat_resblocks_matches_no_remat():
    """model.remat_resblocks trades recompute for activation memory (the
    N=256 nf=256 config OOMs at B>=4 without it) and must be numerically
    equivalent: same loss and same updated params as the un-remat model
    from identical init/batch/rng — and an IDENTICAL param tree structure
    (the nn.remat wrapper must not rename modules, or checkpoints would not
    load across the flag)."""
    batch = tiny_batch(tiny_config())
    results = []
    for remat in (False, True):
        config = tiny_config(model={"remat_resblocks": remat, "dropout": 0.1})
        sde, _ = get_sde(config)
        model = build_model(config)
        state = create_train_state(config, model, jax.random.PRNGKey(0), batch)
        step = make_train_step(config, sde, model, donate=False)
        state, loss = step(state, batch, jax.random.PRNGKey(7))
        results.append((float(loss), state.params))
    assert np.isfinite(results[0][0])
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    assert (jax.tree_util.tree_structure(results[0][1])
            == jax.tree_util.tree_structure(results[1][1]))
    for a, b in zip(jax.tree.leaves(results[0][1]),
                    jax.tree.leaves(results[1][1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_abstract_restore_template_matches_concrete_state():
    """The resume path builds its orbax restore template via jax.eval_shape
    + param_spec instead of materializing a concrete init state (which at
    N=256 fragments HBM enough that the first fused launch after restore
    OOMs — cli/train.py). The template must agree with the real sharded
    state leaf-for-leaf in shape, dtype, AND sharding, or restore would
    silently re-lay-out the checkpoint."""
    from jax.sharding import NamedSharding

    from text2protein_tpu.parallel.mesh import param_spec

    config = tiny_config()
    sde, _ = get_sde(config)
    model = build_model(config)
    batch = tiny_batch(config)
    mesh = make_mesh(data=4, model=2)
    concrete = shard_train_state(
        create_train_state(config, model, jax.random.PRNGKey(0), batch), mesh
    )

    msize = mesh.shape["model"]
    shapes = jax.eval_shape(
        lambda: create_train_state(config, model, jax.random.PRNGKey(0), batch)
    )
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype,
            sharding=NamedSharding(mesh, param_spec(None, x, msize)),
        ),
        shapes,
    )

    assert (jax.tree_util.tree_structure(abstract)
            == jax.tree_util.tree_structure(concrete))
    for a, c in zip(jax.tree.leaves(abstract), jax.tree.leaves(concrete)):
        assert a.shape == c.shape, (a.shape, c.shape)
        assert a.dtype == c.dtype, (a.dtype, c.dtype)
        assert a.sharding == c.sharding, (a.shape, a.sharding, c.sharding)
