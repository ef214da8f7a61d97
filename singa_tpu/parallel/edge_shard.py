"""Cross-chip edge-list sharding for a single oversized graph.

SURVEY §5.7: the reference never scales past one GPU, and nothing in it
scales GRAPH SIZE — its pockets are a few hundred atoms. The TPU-native
long-context analogue is sharding the EDGE LIST of one graph whose message
passing exceeds a chip: each device holds an edge shard, computes partial
per-destination reductions locally, and a single `psum` over the mesh axis
completes the segment reduction — the ring-attention analogue for message
passing (DESIGN.md principles; SURVEY §5.7 "shard the edge list and psum
partial segment reductions").

Design: node arrays stay replicated (node state is O(N*F), small next to
O(E*F) messages for dense interaction graphs); edges are sharded over the
``data`` axis with padded masks, so every collective is a plain psum/pmax
riding ICI. Per-destination softmax needs two passes (pmax of per-dst
maxima, psum of per-dst denominators) — both O(N*H), independent of E.

All entry points are shard_map-wrapped and parity-tested against the
single-device segment ops on an 8-device CPU mesh
(tests/test_edge_shard.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from singa_tpu.ops.segment import segment_max, segment_sum


def shard_edge_list(
    edge_index: jax.Array,  # [E, 2] int32 (src, dst)
    edge_data: Any,  # pytree of [E, ...] arrays (attrs, messages, ...)
    edge_mask: jax.Array,  # [E] bool
    mesh: Mesh,
    axis: str = "data",
):
    """Pad E to a multiple of the mesh axis and device_put the shards.

    Returns (edge_index, edge_data, edge_mask) with the leading edge dim
    sharded over ``axis``; padded edges carry mask=False and dst=0.
    """
    n = mesh.shape[axis]
    E = edge_index.shape[0]
    E_pad = ((E + n - 1) // n) * n

    def pad(x, fill=0):
        if E_pad == E:
            return x
        widths = [(0, E_pad - E)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    sh = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
    )
    ei = sh(pad(edge_index))
    ed = jax.tree_util.tree_map(lambda x: sh(pad(x)), edge_data)
    em = sh(pad(edge_mask.astype(bool), fill=False))
    return ei, ed, em


def sharded_segment_sum(
    messages: jax.Array,  # [E, F] edge messages, E sharded over `axis`
    dst: jax.Array,  # [E] int32 destination node ids, sharded alike
    mask: jax.Array,  # [E] bool
    num_nodes: int,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Per-destination sum of edge messages for ONE graph whose edges are
    sharded across chips: local segment_sum over the shard, psum across the
    axis. Output [num_nodes, F], replicated."""

    def body(msg, d, m):
        part = segment_sum(jnp.where(m[:, None], msg, 0.0), d, num_nodes)
        return jax.lax.psum(part, axis)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(),
    )(messages, dst, mask)


def sharded_edge_softmax(
    scores: jax.Array,  # [E, H] attention logits, E sharded over `axis`
    dst: jax.Array,  # [E] int32
    mask: jax.Array,  # [E] bool
    num_nodes: int,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Numerically-stable per-destination softmax over sharded edges:
    pmax of local per-dst maxima, psum of local per-dst exp sums — two
    O(N*H) collectives, none O(E). Returns [E, H] sharded like scores
    (masked edges get 0)."""

    def body(s, d, m):
        neg = jnp.asarray(-1e30, s.dtype)
        s_live = jnp.where(m[:, None], s, neg)
        mx_part = segment_max(s_live, d, num_nodes, initial=neg)
        mx = jax.lax.pmax(mx_part, axis)  # [N, H] global per-dst max
        e = jnp.exp(s_live - mx[d]) * m[:, None]
        den_part = segment_sum(e, d, num_nodes)
        den = jax.lax.psum(den_part, axis)  # [N, H]
        return e / jnp.maximum(den[d], 1e-16)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(scores, dst, mask)


def sharded_gather_src(
    nodes: jax.Array,  # [N, F] node features, replicated
    src: jax.Array,  # [E] int32, sharded over `axis`
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Source-feature gather with replicated nodes: purely local per shard
    (no collective at all — the win of the replicated-node layout)."""

    def body(x, s):
        return jnp.take(x, s, axis=0)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis)
    )(nodes, src)


def sharded_attention_pass(
    nodes: jax.Array,  # [N, F] replicated
    edge_index: jax.Array,  # [E, 2] sharded
    scores: jax.Array,  # [E, H] sharded
    values: jax.Array,  # [E, F] sharded per-edge value messages
    mask: jax.Array,  # [E] sharded
    num_nodes: int,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """One full attention-weighted message-passing step over a sharded edge
    list: softmax(scores) per destination, weighted value aggregation.
    Composition of the primitives above; output [N, F] replicated."""
    alpha = sharded_edge_softmax(scores, edge_index[:, 1], mask, num_nodes, mesh, axis)
    weighted = values * alpha.mean(axis=-1, keepdims=True)
    return sharded_segment_sum(
        weighted, edge_index[:, 1], mask, num_nodes, mesh, axis
    )
