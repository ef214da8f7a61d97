import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from singa_tpu.config import Config, PAD_TOKEN
from singa_tpu.data.dataset import NpzDataset

REF_PROTEIN = "/root/reference/example/7cff_protein.pdb"
REF_LIGAND = "/root/reference/example/7cff_ligand.sdf"


@pytest.fixture(scope="module")
def etl_output(tmp_path_factory):
    import dataclasses

    from make_dataset import process_one
    from singa_tpu.config import ShapeConfig

    out = tmp_path_factory.mktemp("etl")
    # 7cff is a full protein; its 10A pocket (555 atoms) needs a larger
    # bucket than the CrossDocked pocket10 default.
    cfg = dataclasses.replace(
        Config(), shapes=ShapeConfig(num_protein_nodes=640, num_pp_edges=1408)
    )
    err = process_one(REF_PROTEIN, REF_LIGAND, str(out / "7cff.npz"), cfg)
    assert err is None, err
    return str(out), cfg


def test_etl_produces_valid_complex(etl_output):
    outdir, cfg = etl_output
    ds = NpzDataset(outdir, batch_size=1, shuffle=False)
    batch = next(ds.epoch())

    # pocket is populated and within bucket
    n_prot = int(np.asarray(batch.protein.mask).sum())
    assert 50 < n_prot <= cfg.shapes.num_protein_nodes
    n_lig = int(np.asarray(batch.ligand.mask).sum())
    assert 5 < n_lig <= cfg.shapes.num_ligand_nodes

    # features: one-hot blocks valid on real atoms
    x = np.asarray(batch.protein.x[0])
    m = np.asarray(batch.protein.mask[0])
    np.testing.assert_allclose(x[m, :44].sum(1), 1.0)

    # covalent edges reference valid atoms
    ei = np.asarray(batch.pp.index[0])
    em = np.asarray(batch.pp.mask[0])
    assert em.sum() > 50
    assert (ei[em] < n_prot).all()

    # interaction edges exist (every ligand atom gets at least one)
    assert np.asarray(batch.lp.mask).sum() >= 1
    attr = np.asarray(batch.lp.attr[0])[np.asarray(batch.lp.mask[0])]
    assert (attr[:, 0] > 0).all()  # distances positive

    # property labels present
    assert float(batch.props.weight[0]) > 100
    # vina label from the native scorer
    assert float(batch.props.vina[0]) < 0.0

    # tokens: SMILES encoded with pad tail
    toks = np.asarray(batch.tokens.input[0])
    assert toks[0] == 2  # '&'
    assert (toks == PAD_TOKEN).sum() > 0

    # laplacian PE non-zero on real atoms only
    lap = np.asarray(batch.protein.lap_pe[0])
    assert np.abs(lap[m]).sum() > 0
    assert np.abs(lap[~m]).sum() == 0


def test_etl_model_consumes(etl_output):
    import jax

    from singa_tpu.models.singa import SINGA, cross_entropy_loss
    from tests.test_model import tiny_config

    outdir, _ = etl_output
    ds = NpzDataset(outdir, batch_size=1, shuffle=False)
    batch = next(ds.epoch())
    cfg = tiny_config()
    # tiny model over real-ETL shapes: adjust decoder length to data
    import dataclasses

    model_cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            decoder=dataclasses.replace(cfg.model.decoder, tgt_len=200),
        ),
    )
    model = SINGA(model_cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    logits = jax.jit(model.apply)(params, batch)
    loss = cross_entropy_loss(logits, batch.tokens.target)
    assert np.isfinite(float(loss))
