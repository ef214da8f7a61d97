import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singa_tpu.config import (
    Config,
    DecoderConfig,
    EmbeddingConfig,
    EncoderConfig,
    ModelConfig,
    ShapeConfig,
    TrainConfig,
)
from singa_tpu.data.batch import synthetic_batch
from singa_tpu.equivariant import so3
from singa_tpu.equivariant.embedding import EquivariantEmbedding
from singa_tpu.models.singa import SINGA, cross_entropy_loss

TGT_LEN = 24


def tiny_config(lmax=2, mmax=1):
    return Config(
        embedding=EmbeddingConfig(
            edge_channels=8,
            sphere_channels=8,
            attn_hidden_channels=16,
            attn_alpha_channels=4,
            attn_value_channels=4,
            ffn_hidden_channels=16,
            lmax=lmax,
            mmax=mmax,
            num_heads=2,
            num_layers=2,
        ),
        model=ModelConfig(
            featurizer_feat_dim=8 * (lmax + 1) ** 2,
            hidden_channels=32,
            encoder=EncoderConfig(
                hidden_channels=32,
                edge_channels=8,
                key_channels=16,
                num_heads=2,
                num_interactions=3,
                knn=6,
                knn_aa=4,
            ),
            decoder=DecoderConfig(
                tgt_len=TGT_LEN,
                hidden_channels=32,
                key_channels=16,
                num_heads=2,
                num_interactions=3,
                ffn_hidden=64,
            ),
        ),
        shapes=ShapeConfig(
            num_protein_nodes=24,
            num_ligand_nodes=10,
            num_pp_edges=48,
            num_ll_edges=20,
            num_lp_edges=12,
            num_pl_edges=12,
        ),
        train=TrainConfig(compute_dtype="float32"),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch = synthetic_batch(0, batch_size=2, shapes=cfg.shapes, tgt_len=TGT_LEN)
    model = SINGA(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    apply = jax.jit(model.apply)
    return cfg, batch, model, params, apply


def test_forward_shapes(setup):
    cfg, batch, model, params, apply = setup
    logits = apply(params, batch)
    assert logits.shape == (2, TGT_LEN, cfg.model.decoder.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    loss = cross_entropy_loss(logits, batch.tokens.target)
    assert np.isfinite(float(loss))


def test_padding_invariance(setup):
    """Garbage in padded nodes/edges must not change the logits."""
    cfg, batch, model, params, apply = setup
    logits1 = np.asarray(apply(params, batch))

    # corrupt padded protein entries
    pmask = np.asarray(batch.protein.mask)
    noise = jnp.asarray((~pmask)[..., None] * 7.3)
    prot = batch.protein._replace(
        x=batch.protein.x + noise * 0.5,
        pos=batch.protein.pos + noise,
        atomic_num=jnp.where(batch.protein.mask, batch.protein.atomic_num, 5),
    )
    lmask = np.asarray(batch.ligand.mask)
    lnoise = jnp.asarray((~lmask)[..., None] * 3.1)
    lig = batch.ligand._replace(pos=batch.ligand.pos + lnoise)
    batch2 = batch._replace(protein=prot, ligand=lig)
    logits2 = np.asarray(apply(params, batch2))
    np.testing.assert_allclose(logits1, logits2, atol=2e-4)


def test_gradients_flow(setup):
    cfg, batch, model, params, apply = setup

    def loss_fn(p):
        return cross_entropy_loss(model.apply(p, batch), batch.tokens.target)

    grads = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    norms = [float(jnp.abs(g).max()) for g in leaves]
    assert max(norms) > 0.0


def test_embedding_equivariance():
    """Global rotation of the complex rotates the equivariant features."""
    cfg = tiny_config(lmax=2, mmax=2)
    batch = synthetic_batch(3, batch_size=1, shapes=cfg.shapes, tgt_len=TGT_LEN)
    emb = EquivariantEmbedding(cfg.embedding)
    params = jax.jit(emb.init)(jax.random.PRNGKey(1), batch)
    apply = jax.jit(emb.apply)
    out1 = apply(params, batch)

    rng = np.random.default_rng(9)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    R = jnp.asarray(Q, jnp.float32)
    rot_batch = batch._replace(
        protein=batch.protein._replace(pos=batch.protein.pos @ R.T),
        ligand=batch.ligand._replace(pos=batch.ligand.pos @ R.T),
    )
    out2 = apply(params, rot_batch)

    lmax = cfg.embedding.lmax
    expected = so3.rotate_full(R[None], out1.protein, lmax)
    got = np.asarray(out2.protein)
    exp = np.asarray(expected)
    denom = np.abs(exp).max() + 1e-9
    rel = np.abs(got - exp).max() / denom
    assert rel < 0.05, rel
    # l=0 (invariant) channel should match tightly
    rel0 = np.abs(got[:, 0] - exp[:, 0]).max() / (np.abs(exp[:, 0]).max() + 1e-9)
    assert rel0 < 0.02, rel0
