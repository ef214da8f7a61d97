"""Masked segment reductions — the TPU replacement for torch_scatter.

The reference uses torch_scatter's ``scatter_sum`` / ``scatter_softmax``
(/root/reference/model/CProMG.py:15,66,74) and ``index_add_``
(/root/reference/model/EF_layers.py:342-351) for message aggregation.
On TPU, XLA lowers ``jax.ops.segment_sum`` to efficient one-hot matmuls /
scatters with static shapes; every op here takes an optional boolean mask
so padded edges contribute exactly zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _apply_mask(data: jax.Array, mask: jax.Array | None) -> jax.Array:
    if mask is None:
        return data
    shape = mask.shape + (1,) * (data.ndim - mask.ndim)
    return jnp.where(mask.reshape(shape), data, jnp.zeros_like(data))


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets. Masked rows contribute 0."""
    data = _apply_mask(data, mask)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    eps: float = 1e-12,
) -> jax.Array:
    total = segment_sum(data, segment_ids, num_segments, mask)
    if mask is None:
        ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    else:
        ones = mask.astype(data.dtype)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    count = count.reshape(count.shape + (1,) * (total.ndim - count.ndim))
    return total / jnp.maximum(count, eps)


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    initial: float = -jnp.inf,
) -> jax.Array:
    if mask is not None:
        shape = mask.shape + (1,) * (data.ndim - mask.ndim)
        data = jnp.where(mask.reshape(shape), data, jnp.full_like(data, initial))
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Numerically-stable softmax over variable-size segments.

    Replaces ``pyg.utils.softmax`` (/root/reference/model/EF_layers.py:1180) and
    ``torch_scatter.scatter_softmax`` (/root/reference/model/CProMG.py:66).
    Masked entries get probability exactly 0; fully-masked segments yield 0
    (not NaN), so padded graphs are inert.
    """
    neg = jnp.asarray(-1e30, dtype=logits.dtype)
    if mask is not None:
        shape = mask.shape + (1,) * (logits.ndim - mask.ndim)
        logits = jnp.where(mask.reshape(shape), logits, neg)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, jnp.zeros_like(seg_max))
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        shape = mask.shape + (1,) * (exp.ndim - mask.ndim)
        exp = jnp.where(mask.reshape(shape), exp, jnp.zeros_like(exp))
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)
