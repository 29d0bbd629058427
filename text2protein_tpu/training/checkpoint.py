"""Orbax checkpointing with the reference's artifact triad.

The reference keeps (a) `checkpoints-meta/checkpoint.pth` written every epoch
for preemption resume, (b) `checkpoints/best_train.pth`, (c)
`checkpoints/best_eval.pth` (`/root/reference/train.py:117-127,185,230-255`;
torch-pickle of {optimizer, model, ema, step},
`/root/reference/score_sde_pytorch/utils.py:11-26`). Same layout here, as
orbax PyTree checkpoints of the TrainState.
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, workdir):
        self.workdir = Path(workdir).absolute()
        self.meta_dir = self.workdir / "checkpoints-meta"
        self.best_dir = self.workdir / "checkpoints"
        self.meta_dir.mkdir(parents=True, exist_ok=True)
        self.best_dir.mkdir(parents=True, exist_ok=True)
        # Async so best-checkpoint saves overlap training: orbax copies the
        # arrays device->host inside save() (donation-safe — the state can be
        # overwritten the moment save() returns) and serializes to disk in a
        # background thread. At N=256 the 379M-param state costs minutes per
        # save; sync saves stalled the train loop for all of it.
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._purge_stale_tmp()

    def _purge_stale_tmp(self):
        """Remove orbax tmp dirs left by a save killed mid-write (observed:
        `best_train.orbax-checkpoint-tmp` after a SIGKILL during the disk
        phase). They are never a valid restore source, and a stale one at
        the target name can confuse a later force-save."""
        import shutil

        for d in (self.meta_dir, self.best_dir):
            for p in d.glob("*.orbax-checkpoint-tmp*"):
                shutil.rmtree(p, ignore_errors=True)

    def _save(self, path: Path, state: TrainState, block: bool = True):
        # one in-flight save at a time: orbax raises if the previous async
        # write is still running when save() is called again
        self._ckptr.wait_until_finished()
        self._ckptr.save(path, jax.tree.map(lambda x: x, state), force=True)
        if block:
            self._ckptr.wait_until_finished()

    def wait_until_finished(self):
        """Block until any in-flight async save has committed to disk."""
        self._ckptr.wait_until_finished()

    def _restore(self, path: Path, template: TrainState) -> TrainState:
        self._ckptr.wait_until_finished()
        return self._ckptr.restore(path, template)

    # -- preemption checkpoint ------------------------------------------------
    def save_meta(self, state: TrainState):
        """Crash-safe: orbax's force-overwrite deletes the existing
        checkpoint before writing, so a preemption DURING the save would lose
        both the old and the new state. Write to a sibling dir, then swap.
        A crash anywhere leaves at least one COMPLETE checkpoint dir (orbax
        itself writes via tmp+rename, so `checkpoint.next` only exists once
        fully written); `_meta_path` resolves checkpoint > next > old."""
        import shutil

        target = self.meta_dir / "checkpoint"
        staging = self.meta_dir / "checkpoint.next"
        old = self.meta_dir / "checkpoint.old"
        if staging.exists():
            shutil.rmtree(staging)
        self._save(staging, state)
        if old.exists():
            shutil.rmtree(old)
        if target.exists():
            target.rename(old)
        staging.rename(target)
        if old.exists():
            shutil.rmtree(old)

    def _meta_path(self):
        """Newest complete preemption checkpoint. `checkpoint.next` only
        exists when a save fully finished but the swap was interrupted — it
        is then strictly newer than `checkpoint` (every save clears stale
        staging first), so it wins; `checkpoint.old` is the mid-swap
        survivor."""
        for name in ("checkpoint.next", "checkpoint", "checkpoint.old"):
            p = self.meta_dir / name
            if p.exists():
                return p
        return None

    def has_meta(self) -> bool:
        return self._meta_path() is not None

    def restore_meta(self, template: TrainState) -> TrainState:
        return self._restore(self._meta_path(), template)

    # -- best checkpoints ------------------------------------------------------
    def save_best(self, state: TrainState, kind: str):
        """Non-blocking: returns once the state is copied off-device; the
        disk write proceeds in the background (next save/restore/
        `wait_until_finished` joins it). The meta checkpoint stays blocking
        because its crash-safe swap dance needs the write committed."""
        assert kind in ("train", "eval")
        self._save(self.best_dir / f"best_{kind}", state, block=False)

    def restore_best(self, template: TrainState, kind: str) -> TrainState:
        return self._restore(self.best_dir / f"best_{kind}", template)

    def save_snapshot(self, state: TrainState, tag):
        """Named milestone checkpoint (`checkpoints/snapshot_<tag>`) that
        best/meta overwrites never clobber — e.g. a fixed-step checkpoint
        kept for matched-step ablations (cli/train.py
        training.snapshot_steps). Async like best saves."""
        self._save(self.best_dir / f"snapshot_{tag}", state, block=False)

    def restore_any(self, template: TrainState, path=None) -> TrainState:
        """Restore from an explicit path, else best_eval, best_train, meta.

        `path` also accepts the bare names "best_eval" / "best_train" /
        "meta", resolved inside this manager's workdir — eval drivers pass
        `--checkpoint best_train` when avg_eval noise has frozen best_eval
        at an early step (observed: a 379M N=256 run whose best_eval stuck
        at step 4000 on a 0.0470-vs-0.0476 coin flip)."""
        if path is not None:
            p = Path(path)
            if str(p) in ("best_eval", "best_train"):
                p = self.best_dir / str(p)
            elif str(p) == "meta":
                p = self._meta_path()
            else:
                p = p.absolute()
            return self._restore(p, template)
        for cand in (
            self.best_dir / "best_eval",
            self.best_dir / "best_train",
            self._meta_path(),
        ):
            if cand is not None and cand.exists():
                return self._restore(cand, template)
        raise FileNotFoundError(f"no checkpoint under {self.workdir}")

    def restore_newest(self, template: TrainState) -> TrainState:
        """Freshest state for RESUMING TRAINING: the most recently written of
        best_eval / best_train / meta. Saves are serialized and monotonic in
        step, so newest write == highest step. This is deliberately not
        `restore_any`'s order — best_eval is the best MODEL (what samplers
        want), not the newest STATE; preferring it for resume was observed to
        throw away 1800 steps of an N=256 run whose eval loss had a lucky
        early minimum."""
        cands = [
            p
            for p in (
                self.best_dir / "best_eval",
                self.best_dir / "best_train",
                self._meta_path(),
            )
            if p is not None and p.exists()
        ]
        if not cands:
            raise FileNotFoundError(f"no checkpoint under {self.workdir}")

        def commit_time(p: Path) -> float:
            meta = p / "_CHECKPOINT_METADATA"
            return (meta if meta.exists() else p).stat().st_mtime

        return self._restore(max(cands, key=commit_time), template)


def restore_ema_params(workdir, config, model, init_batch, checkpoint=None):
    """Memory-lean restore for sampling-side consumers: (ema_params, step).

    Restores against an abstract `jax.eval_shape` template and returns only
    the EMA params (what `ema.copy_to` yields in the reference,
    `/root/reference/sampling_6d.py:66-73`), letting the raw-param and
    optimizer slots be freed immediately. A materialized init template plus
    the restored state would hold TWO full train states (~12 GB at N=256 of
    a v5e chip's 15.75 GB) and the first sampler launch OOMs.
    """
    import jax

    from .state import create_train_state

    template = jax.eval_shape(
        lambda: create_train_state(config, model, jax.random.PRNGKey(0),
                                   init_batch)
    )
    state = CheckpointManager(workdir).restore_any(template, checkpoint)
    step = int(jax.device_get(state.step))
    return state.ema.params, step
