"""Ligand masking as a batch transform.

Re-design of /root/reference/model/Masking.py (LigandMasking + hetero
subgraph): with fixed-shape padded batches, masking is just an update of the
boolean masks — no index relabelling or ragged subgraph extraction needed.
Edges touching a masked ligand atom are masked out of ll/lp/pl edge sets.
Used for masked/fragment-conditioned training objectives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from singa_tpu.data.batch import ComplexBatch


def mask_ligand(
    batch: ComplexBatch,
    key: jax.Array,
    min_ratio: float = 0.1,
    max_ratio: float = 0.9,
    min_unmasked: int = 1,
) -> tuple[ComplexBatch, jax.Array]:
    """Randomly mask a per-graph ratio of ligand atoms (Masking.py:39-65).

    Returns (masked batch, masked_indicator [B, Nl]) where the indicator marks
    the atoms that were *removed* (the prediction targets in masked training).
    """
    B, Nl = batch.ligand.mask.shape
    k_ratio, k_perm = jax.random.split(key)
    ratio = jax.random.uniform(k_ratio, (B, 1), minval=min_ratio, maxval=max_ratio)

    scores = jax.random.uniform(k_perm, (B, Nl))
    scores = jnp.where(batch.ligand.mask, scores, 2.0)  # padded last
    order = jnp.argsort(scores, axis=1)
    rank = jnp.zeros_like(order).at[
        jnp.arange(B)[:, None], order
    ].set(jnp.broadcast_to(jnp.arange(Nl), (B, Nl)))

    n_valid = batch.ligand.mask.sum(axis=1, keepdims=True)
    n_masked = jnp.clip(
        (n_valid * ratio).astype(jnp.int32), 1, jnp.maximum(n_valid - min_unmasked, 1)
    )
    masked = (rank < n_masked) & batch.ligand.mask

    keep = batch.ligand.mask & ~masked
    new_ligand = batch.ligand._replace(mask=keep)

    def drop_edges(es, src_is_ligand: bool, dst_is_ligand: bool):
        m = es.mask
        if src_is_ligand:
            src_keep = jnp.take_along_axis(keep, es.index[..., 0], axis=1)
            m = m & src_keep
        if dst_is_ligand:
            dst_keep = jnp.take_along_axis(keep, es.index[..., 1], axis=1)
            m = m & dst_keep
        return es._replace(mask=m)

    return (
        batch._replace(
            ligand=new_ligand,
            ll=drop_edges(batch.ll, True, True),
            lp=drop_edges(batch.lp, True, False),
            pl=drop_edges(batch.pl, False, True),
        ),
        masked,
    )
