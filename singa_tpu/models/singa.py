"""SINGA: the flagship property-conditioned pocket-to-SMILES generator.

Composite of the SE(3)-equivariant embedding and the CProMG transformer —
re-design of /root/reference/model/GAN.py. The reference's host-side python
loops (ptr->batch expansion, GAN.py:48-55; property zip, GAN.py:42) are
replaced by fully traced array ops on the fixed-shape batch, and the
per-forward DGL Laplacian eigendecomposition (GAN.py:71,77) by ETL-time
precomputed PEs carried in the batch.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from singa_tpu.config import Config, PAD_TOKEN
from singa_tpu.data.batch import ComplexBatch
from singa_tpu.equivariant.embedding import EquivariantEmbedding
from singa_tpu.models.cpromg import CProMGTransformer

# Property-conditioning thresholds (reference GAN.py:37-44)
VINA_GOOD = -7.5
QED_GOOD = 0.6
SAS_GOOD = 4.0


def binarize_props(batch: ComplexBatch, props: tuple[str, ...]) -> jax.Array:
    """Binary 'is-good' conditioning vector [B, P] (GAN.py:37-44)."""
    table = {
        "vina_score": (batch.props.vina < VINA_GOOD),
        "qed": (batch.props.qed > QED_GOOD),
        "sas": (batch.props.sas < SAS_GOOD),
        "logP": batch.props.logp,
        "weight": batch.props.weight,
        "tpsa": batch.props.tpsa,
    }
    cols = [table[p].astype(jnp.float32) for p in props]
    return jnp.stack(cols, axis=-1)


class SINGA(nn.Module):
    config: Config

    def setup(self):
        self.embedding = EquivariantEmbedding(self.config.embedding)
        self.model = CProMGTransformer(self.config.model, pad_token=PAD_TOKEN)

    def __call__(self, batch: ComplexBatch) -> jax.Array:
        """Returns next-token logits [B, tgt_len, vocab]."""
        cfg = self.config
        B = batch.batch_size
        feat_dim = cfg.model.featurizer_feat_dim

        prop = None
        if cfg.model.num_props:
            prop = binarize_props(batch, cfg.model.props)

        emb = self.embedding(batch)
        protein_feat = emb.protein.reshape(B, -1, feat_dim)
        ligand_feat = emb.ligand.reshape(B, -1, feat_dim)

        return self.model(
            protein_feat,
            batch.protein.pos,
            batch.protein.mask,
            batch.protein.lap_pe,
            batch.tokens.input,
            ligand_feat,
            batch.ligand.pos,
            batch.ligand.mask,
            batch.ligand.lap_pe,
            prop,
        )

    def encode_pocket(self, batch: ComplexBatch):
        """Protein-only path for generation (gen_mode; reference gen.py:157-160
        + BeamSearch.py:64-76, which skips encoder2 entirely)."""
        B = batch.batch_size
        emb = self.embedding(batch, gen_mode=True)
        protein_feat = emb.protein.reshape(B, -1, self.config.model.featurizer_feat_dim)
        enc1, pad1, _ = self.model.encode(
            protein_feat, batch.protein.pos, batch.protein.mask, batch.protein.lap_pe
        )
        return enc1, pad1

    def decode_step(self, tokens, enc, enc_pad_mask, prop):
        """Full-prefix decode (generation fallback; cached path in generate/beam)."""
        return self.model.decode(tokens, enc, enc_pad_mask, prop)

    def prime_cache(self, enc, enc_pad_mask, prop):
        """Initialise the decoder KV cache with the property prefix."""
        return self.model.prime_cache(enc, enc_pad_mask, prop)

    def decode_token(self, token, pos, enc, enc_pad_mask):
        """KV-cached one-token decode -> next-token logits [B, V]."""
        return self.model.decode_token(token, pos, enc, enc_pad_mask)


def cross_entropy_loss(
    logits: jax.Array,  # [B, T, V]
    targets: jax.Array,  # [B, T]
    mask_pad: bool = False,
    pad_token: int = PAD_TOKEN,
) -> jax.Array:
    """Token CE. The reference averages over *all* positions, including
    padding targets (train.py:106,123 — no ignore_index); ``mask_pad=False``
    reproduces that for loss parity."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask_pad:
        w = (targets != pad_token).astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(nll)
