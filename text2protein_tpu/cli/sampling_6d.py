"""6D-map sampling CLI — `python -m text2protein_tpu.cli.sampling_6d <config>
<checkpoint> [...]`.

Same flag set and workflow as `/root/reference/sampling_6d.py:41-163`: restore
the EMA model from a checkpoint, iterate test-set captions from the training
workdir's test_ids.txt, run the PC sampler per caption batch with optional
length-sweep / PDB-derived / inpainting conditions, and pickle one
`sampled_{pdb_id}.pkl` per design in (1, C, N, N) layout.
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="Sample 6D geometry maps")
    p.add_argument("config", type=str)
    p.add_argument("checkpoint", type=str)
    p.add_argument("--pdb", type=str, default=None)
    p.add_argument("--chain", type=str, default="A")
    p.add_argument("--mask_info", type=str, default="1:5,10:15")
    p.add_argument("--tag", type=str, default="test")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--select_length", action="store_true")
    p.add_argument("--length_index", type=int, default=1)  # 1-based
    p.add_argument("--num_steps", type=int, default=None,
                   help="override num_scales PC steps (faster schedules)")
    p.add_argument("--sampler", type=str, default=None,
                   choices=["pc", "ode", "hybrid"],
                   help="override config sampling.method (hybrid = ODE-head "
                        "+ PC-tail deployment sampler, NFE 460)")
    p.add_argument("--processed_dir", type=str, default=None,
                   help="processed records dir for test-set captions")
    return p


def load_test_captions(checkpoint: Path, processed_dir: str | None):
    """Captions of the training run's held-out ids
    (`/root/reference/sampling_6d.py:98-116`)."""
    from ..data import load_record

    run_dir = Path(checkpoint).parent.parent
    ids_file = run_dir / "test_ids.txt"
    if not ids_file.exists():
        return []
    test_ids = [l.strip() for l in ids_file.read_text().splitlines() if l.strip()]
    out = []
    for tid in test_ids:
        for ext in (".npz", ".pt"):
            p = Path(processed_dir or ".") / f"{tid}{ext}"
            if p.exists():
                rec = load_record(p)
                out.append((tid, rec["caption"]))
                break
    return out


def main(argv=None):
    args = build_argparser().parse_args(argv)
    assert not (args.pdb is not None and args.select_length)

    import jax
    import jax.numpy as jnp

    from ..config import load_config
    from ..conditioning import get_mask_all_lengths
    from ..diffusion import get_sde
    from ..diffusion.sampling import get_sampling_fn
    from ..models import build_model
    from ..text import build_text_encoder
    from ..training import restore_ema_params

    config = load_config(args.config)
    workdir = Path("sampling", "coords_6d", Path(args.config).stem,
                   Path(args.checkpoint).parent.parent.stem, args.tag)
    workdir.mkdir(parents=True, exist_ok=True)

    b = args.batch_size
    n = config.data.max_res_num
    c = config.data.num_channels
    shape = (b, n, n, c)

    sde, sampling_eps = get_sde(config)
    model = build_model(config)
    encoder = build_text_encoder(config)

    # Template init + EMA restore.
    dummy = {
        "coords_6d": jnp.zeros(shape, jnp.float32),
        "context": jnp.zeros((b, 8, config.model.context_dim), jnp.float32),
        "context_mask": jnp.zeros((b, 8), bool),
    }
    ckpt_path = Path(args.checkpoint)
    params, step = restore_ema_params(
        ckpt_path.parent.parent, config, model, dummy,
        checkpoint=ckpt_path if ckpt_path.exists() else None,
    )
    print(f"restored step {step} from {ckpt_path}")

    if args.sampler:
        config.sampling.method = args.sampler
    from ..diffusion.sampling import pick_chunk

    # keep every device launch under the platform's wall-clock cap (N=256
    # trajectories need much smaller chunks than L=128)
    n_traj = args.num_steps or sde.N
    sampling_fn = get_sampling_fn(
        config, sde, model, shape, sampling_eps, num_steps=args.num_steps,
        chunk_size=pick_chunk(n_traj, 100 if n >= 256 else 500))

    captions = load_test_captions(ckpt_path, args.processed_dir)
    if not captions:
        captions = [(f"design_{i}", "") for i in range(b)]
    if len(captions) < b:  # cycle to fill one full batch
        captions = (captions * b)[:b]

    rng = jax.random.PRNGKey(config.seed)
    n_batches = max(len(captions) // b, 1)
    for bi in range(n_batches):
        chunk = captions[bi * b : (bi + 1) * b]
        if len(chunk) != b:
            continue  # skip ragged final batch (`sampling_6d.py:131-132`)
        pdb_ids = [cid for cid, _ in chunk]
        emb, emb_mask = encoder.encode([cap for _, cap in chunk])

        if args.select_length:
            masks = get_mask_all_lengths(config, batch_size=b)
            condition = {"length": masks[args.length_index - 1]}
        elif args.pdb is not None:
            from ..conditioning import get_conditions_from_pdb

            condition = get_conditions_from_pdb(
                args.pdb, config, args.chain, args.mask_info, batch_size=b
            )
        else:
            condition = {}

        for it in range(args.n_iter):
            rng, sub = jax.random.split(rng)
            sample, nfe = sampling_fn(
                params, sub, condition=condition,
                context=jnp.asarray(emb), context_mask=jnp.asarray(emb_mask),
            )
            sample = np.asarray(sample).transpose(0, 3, 1, 2)  # -> (B, C, N, N)
            for i, pid in enumerate(pdb_ids):
                tag = f"_{it}" if args.n_iter > 1 else ""
                with open(workdir / f"sampled_{pid}{tag}.pkl", "wb") as f:
                    pickle.dump(sample[i : i + 1], f)
        print(f"[{bi + 1}/{n_batches}] saved {b} samples (NFE {int(nfe)})")

    print(f"samples under {workdir}")
    return workdir


if __name__ == "__main__":
    main()
