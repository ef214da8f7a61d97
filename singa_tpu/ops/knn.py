"""Batched, masked k-nearest-neighbour graph construction with static shapes.

Replaces torch_cluster's ``knn_graph`` / ``radius_graph``
(/root/reference/model/CProMG.py:293,330, gen.py:135). Works on dense padded
batches ``pos [B, N, 3]`` + ``mask [B, N]``; everything is fixed-shape so the
result can live inside ``jit``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EdgeList(NamedTuple):
    """Flat edge list over a padded batch.

    ``src``/``dst`` are *global* node indices in ``[0, B*N)``; ``mask`` marks
    real edges. Padded edges point at node 0 and are masked out.
    """

    src: jax.Array  # [B*E] int32
    dst: jax.Array  # [B*E] int32
    mask: jax.Array  # [B*E] bool


def _pairwise_dist2(pos: jax.Array) -> jax.Array:
    # [B, N, N]; |x|^2 - 2xy + |y|^2 keeps the hot part a matmul (MXU).
    n2 = jnp.sum(pos * pos, axis=-1)
    cross = jnp.einsum("bnc,bmc->bnm", pos, pos)
    d2 = n2[:, :, None] - 2.0 * cross + n2[:, None, :]
    return jnp.maximum(d2, 0.0)


def _gather_rows(table: jax.Array, gather_idx: jax.Array) -> jax.Array:
    """Per-batch fancy gather: out[b, ...] = table[b][gather_idx[b, ...]]."""
    return jax.vmap(lambda t, g: t[g])(table, gather_idx)


def knn_neighbors(
    pos: jax.Array,
    mask: jax.Array,
    k: int,
    include_self: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """For each node, indices of its k nearest valid neighbours.

    Returns ``(idx [B, N, K], valid [B, N, K])``. Nodes with fewer than K valid
    neighbours get masked entries (idx clamped to 0).
    """
    _, N, _ = pos.shape
    d2 = _pairwise_dist2(pos)
    big = jnp.asarray(jnp.inf, dtype=d2.dtype)
    invalid = ~(mask[:, None, :] & mask[:, :, None])
    d2 = jnp.where(invalid, big, d2)
    if not include_self:
        eye = jnp.eye(N, dtype=bool)
        d2 = jnp.where(eye[None], big, d2)
    neg, idx = jax.lax.top_k(-d2, k)
    valid = jnp.isfinite(neg)
    idx = jnp.where(valid, idx, 0)
    return idx.astype(jnp.int32), valid


def knn_graph(
    pos: jax.Array,
    mask: jax.Array,
    k: int,
    undirected: bool = True,
) -> EdgeList:
    """Static-shape kNN edge list.

    Directed semantics match PyG ``knn_graph(flow='target_to_source')``: edge
    ``(i, j)`` means "query node i attends to neighbour j"; messages aggregate
    to ``src`` (the reference aggregates to ``row``, CProMG.py:74).

    With ``undirected=True`` the reverse edge ``(j, i)`` is appended unless the
    pair is already mutual, giving the exact undirected closure that PyG's
    ``to_undirected`` produces after deduplication (CProMG.py:296). Buffer size
    is a static 2*B*N*K.
    """
    B, N, _ = pos.shape
    idx, valid = knn_neighbors(pos, mask, k)

    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    query = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :, None], (B, N, k))
    g_src = (query + base).reshape(-1)
    g_dst = (idx + base).reshape(-1)
    e_mask = valid.reshape(-1)

    if not undirected:
        return EdgeList(g_src, g_dst, e_mask)

    # mutual[b, i, q] = True iff i is itself among kNN(idx[b, i, q]).
    idx_of_neighbors = _gather_rows(idx, idx)  # [B, N, K, K]
    mutual = jnp.any(idx_of_neighbors == query[..., None], axis=-1) & valid

    rev_mask = (valid & ~mutual).reshape(-1)
    src = jnp.concatenate([g_src, g_dst])
    dst = jnp.concatenate([g_dst, g_src])
    msk = jnp.concatenate([e_mask, rev_mask])
    return EdgeList(src, dst, msk)


def radius_graph(
    pos: jax.Array,
    mask: jax.Array,
    radius: float,
    max_degree: int,
) -> EdgeList:
    """Edges to all valid neighbours within ``radius`` (capped at ``max_degree``)."""
    B, N, _ = pos.shape
    idx, valid = knn_neighbors(pos, mask, max_degree)
    pos_n = _gather_rows(pos, idx)  # [B, N, K, 3]
    d2 = jnp.sum((pos[:, :, None, :] - pos_n) ** 2, axis=-1)
    valid = valid & (d2 <= radius * radius)
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    query = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, :, None], (B, N, max_degree)
    )
    return EdgeList(
        (query + base).reshape(-1),
        (jnp.where(valid, idx, 0) + base).reshape(-1),
        valid.reshape(-1),
    )
