"""text2protein_tpu — a TPU-native text-to-protein-backbone diffusion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
szhan227/text2protein reference (score-SDE diffusion over trRosetta-style 6D
inter-residue geometry maps, text-conditioned via caption embeddings, with a
predictor-corrector sampler and downstream 3D backbone realization).

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  config      — YAML config, key-compatible with the reference's configs/*.yml
  data        — PDB parsing, 6D featurization (host numpy + on-device JAX)
  text        — caption -> (B, T, D) context embeddings (cached / hashed / HF)
  models      — Flax score UNet (NCSN++-style with cross-attention)
  diffusion   — SDEs, losses, EMA, lax.scan PC sampler
  parallel    — device mesh + sharding helpers
  ops         — Pallas TPU kernels (fused attention, ...)
  training    — train state, step functions, orbax checkpointing
  eval        — 6D map MSE, TM-score
  realize     — 6D maps -> 3D backbone via restrained torsion minimization
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache (set TEXT2PROTEIN_NO_JAX_CACHE=1 to
    opt out). First compiles of the big configs through the axon TPU tunnel
    take minutes; the persistent cache makes every later process launch with
    the same shapes near-instant."""
    import os

    if os.environ.get("TEXT2PROTEIN_NO_JAX_CACHE"):
        return
    try:
        import jax

        path = os.environ.get(
            "TEXT2PROTEIN_JAX_CACHE",
            os.path.expanduser("~/.cache/text2protein_tpu/jax_cache"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - jax absent or too old
        pass


_enable_compilation_cache()
