"""End-to-end slice: synthetic PDBs -> featurize -> train steps -> sample ->
evaluate — the reference's full workflow (SURVEY.md §3) on tiny shapes."""

import numpy as np
import pytest

from text2protein_tpu.data.dataset import (
    ProteinDataset,
    ProteinProcessedDataset,
    featurize_pdb_file,
    make_batch,
)
from text2protein_tpu.data.pdbio import read_pdb, write_backbone_pdb
from helpers import tiny_config


def ideal_helix_backbone(L, seed=0):
    """Plausible N/CA/C backbone tracing an ideal alpha-helix CA path."""
    rng = np.random.RandomState(seed)
    t = np.deg2rad(100.0) * np.arange(L) + rng.uniform(0, 6.28)
    ca = np.stack(
        [2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(L)], axis=-1
    )
    ca += rng.randn(3) * 5  # random placement
    # N/C offsets approximately along the helix tangent
    tangent = np.gradient(ca, axis=0)
    tangent /= np.linalg.norm(tangent, axis=1, keepdims=True)
    n = ca - 1.46 * tangent + rng.randn(L, 3) * 0.02
    c = ca + 1.52 * tangent + rng.randn(L, 3) * 0.02
    return np.stack([n, ca, c], axis=1)


@pytest.fixture(scope="module")
def pdb_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("pdbs")
    rng = np.random.RandomState(0)
    for i in range(6):
        L = int(rng.randint(8, 17))
        bb = ideal_helix_backbone(L, seed=i)
        seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), size=L))
        write_backbone_pdb(root / f"prot{i}.pdb", bb, seq=seq)
    return root


def test_pdb_roundtrip(pdb_tree):
    path = sorted(pdb_tree.glob("*.pdb"))[0]
    st = read_pdb(path)
    assert st.num_models == 1
    res = st.amino_residues()
    assert len(res) >= 8
    assert all(r.atom("CA") is not None for r in res)


def test_featurize_pdb_file(pdb_tree):
    path = sorted(pdb_tree.glob("*.pdb"))[0]
    rec = featurize_pdb_file(path, 4, 16, ss_constraints=False)
    assert rec is not None
    L = len(rec["aa"])
    assert rec["coords_6d"].shape == (5, L, L)
    assert rec["mask_pair"].all()  # complete backbone -> full mask
    # dist channel symmetric-ish and in [-1, 1]
    assert np.all(rec["coords_6d"][0] <= 1.0 + 1e-6)
    assert np.all(rec["coords_6d"][0] >= -1.0 - 1e-6)
    # length filter
    assert featurize_pdb_file(path, 99, 128, ss_constraints=False) is None


def test_prepare_then_train_then_sample(pdb_tree, tmp_path):
    # --- prepare
    out = tmp_path / "processed"
    ds = ProteinDataset(
        pdb_tree, out_dir=out, min_res_num=4, max_res_num=16,
        ss_constraints=False, num_workers=1,
    )
    n = ds.process()
    assert n >= 4, f"only {n} records written"

    # --- load + collate
    pds = ProteinProcessedDataset(out)
    recs = [pds[i] for i in range(min(4, len(pds)))]
    batch = make_batch(recs, max_len=16)
    assert batch["coords_6d"].shape[1:] == (5, 16, 16)
    assert (batch["length"] >= 4).all()

    # --- train a few steps
    import jax
    import jax.numpy as jnp

    from text2protein_tpu.conditioning import (
        batch_to_device_arrays,
        get_condition_from_batch,
    )
    from text2protein_tpu.diffusion import get_sde
    from text2protein_tpu.diffusion.sampling import get_sampling_fn
    from text2protein_tpu.models import build_model
    from text2protein_tpu.text import HashTextEncoder
    from text2protein_tpu.training import create_train_state, make_train_step

    config = tiny_config(model={"condition": ["length"]})
    sde, eps = get_sde(config)
    model = build_model(config)
    encoder = HashTextEncoder(dim=config.model.context_dim, max_tokens=8,
                              pad_to_bucket=8)

    arrays = batch_to_device_arrays(batch, config)
    emb, emb_mask = encoder.encode(["synthetic helix protein"] * 4)
    arrays["context"] = jnp.asarray(emb)
    arrays["context_mask"] = jnp.asarray(emb_mask)

    state = create_train_state(config, model, jax.random.PRNGKey(0), arrays)
    train_step = make_train_step(config, sde, model, donate=False)
    for i in range(5):
        state, loss = train_step(state, arrays, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))

    # --- sample with length condition from the batch
    shape = (4, 16, 16, 5)
    sampling_fn = get_sampling_fn(config, sde, model, shape, eps, num_steps=8)
    condition = get_condition_from_batch(config, batch)
    sample, nfe = sampling_fn(
        state.ema.params, jax.random.PRNGKey(9), condition=condition,
        context=arrays["context"], context_mask=arrays["context_mask"],
    )
    sample = np.asarray(sample)
    assert nfe == 16
    assert np.isfinite(sample).all()
    # padding-mask channel reproduces the length mask -> L recoverable
    from text2protein_tpu.eval.coords_compare import infer_length_from_padding

    for i in range(4):
        l = infer_length_from_padding(sample[i].transpose(2, 0, 1))
        assert l == int(batch["length"][i])
