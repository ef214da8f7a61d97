"""Baseline GNNs: EGNN, GAT and GIN.

First-class equivalents of the reference's prototype sandbox
(/root/reference/model/vanilla/vanillaModel.py:20-180 — GAT/GIN nets and the
Discriminator prototype; vanillaEquivariantNet.py:22-142 — the EGNN). Useful
as ablation baselines, for property-prediction heads, and as the light
equivariant message-passing alternative to the full SO(3) stack.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from singa_tpu.equivariant.layers import Linear
from singa_tpu.ops.knn import EdgeList
from singa_tpu.ops.segment import segment_mean, segment_softmax, segment_sum


class EGNNLayer(nn.Module):
    """E(n)-equivariant message passing (vanillaEquivariantNet.py:22-97):
    invariant messages from (h_i, h_j, |x_i - x_j|^2); coordinates updated
    along relative vectors."""

    hidden: int
    update_coords: bool = True

    @nn.compact
    def __call__(self, h, pos, edges: EdgeList, num_nodes: int):
        d2 = jnp.sum((pos[edges.src] - pos[edges.dst]) ** 2, axis=-1, keepdims=True)
        m_in = jnp.concatenate([h[edges.src], h[edges.dst], d2], axis=-1)
        m = nn.silu(Linear(self.hidden, name="msg_1")(m_in))
        m = nn.silu(Linear(self.hidden, name="msg_2")(m))
        agg = segment_sum(m, edges.src, num_nodes, mask=edges.mask)
        h_new = h + Linear(h.shape[-1], name="upd")(
            jnp.concatenate([h, agg], axis=-1)
        )
        if self.update_coords:
            w = Linear(1, name="coord")(m)
            delta = segment_mean(
                (pos[edges.src] - pos[edges.dst]) * w, edges.src, num_nodes,
                mask=edges.mask,
            )
            pos = pos + delta
        return h_new, pos


class EGNN(nn.Module):
    hidden: int = 64
    num_layers: int = 4
    out_features: int = 1

    @nn.compact
    def __call__(self, z, pos, edges: EdgeList, graph_ids, num_nodes, num_graphs):
        h = nn.Embed(84, self.hidden, name="embed")(z)
        for i in range(self.num_layers):
            h, pos = EGNNLayer(self.hidden, name=f"layer_{i}")(h, pos, edges, num_nodes)
        pooled = segment_sum(h, graph_ids, num_graphs)
        return Linear(self.out_features, name="head")(nn.silu(pooled))


class GATLayer(nn.Module):
    """Graph attention (vanillaModel.py:20-74)."""

    features: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, h, edges: EdgeList, num_nodes: int):
        g = Linear(self.features, use_bias=False, name="proj")(h)
        a_src = Linear(1, use_bias=False, name="attn_src")(g)[:, 0]
        a_dst = Linear(1, use_bias=False, name="attn_dst")(g)[:, 0]
        logits = nn.leaky_relu(
            a_src[edges.src] + a_dst[edges.dst], self.negative_slope
        )
        alpha = segment_softmax(logits, edges.src, num_nodes, mask=edges.mask)
        out = segment_sum(
            g[edges.dst] * alpha[:, None], edges.src, num_nodes, mask=edges.mask
        )
        return nn.elu(out)


class GIN(nn.Module):
    """GIN stack with sum pooling (vanillaModel.py:96-180 `Net`/`Discriminator`)."""

    hidden: int = 64
    num_layers: int = 3
    out_features: int = 1

    @nn.compact
    def __call__(self, x, edges: EdgeList, graph_ids, num_nodes, num_graphs):
        h = x
        for i in range(self.num_layers):
            agg = segment_sum(h[edges.dst], edges.src, num_nodes, mask=edges.mask)
            z = h + agg
            z = nn.relu(Linear(self.hidden, name=f"mlp{i}_1")(z))
            h = nn.relu(Linear(self.hidden, name=f"mlp{i}_2")(z))
        pooled = segment_sum(h, graph_ids, num_graphs)
        z = nn.relu(Linear(self.hidden, name="out_1")(pooled))
        return Linear(self.out_features, name="out_2")(z)


def check_rotation_equivariance(apply_fn, h, pos, rot, atol=1e-4) -> bool:
    """z-rotation sanity helper (vanillaHelper.py:81-102): an invariant model
    must give identical outputs for rotated inputs."""
    import numpy as np

    out1 = apply_fn(h, pos)
    out2 = apply_fn(h, pos @ jnp.asarray(rot, pos.dtype).T)
    return bool(np.allclose(np.asarray(out1), np.asarray(out2), atol=atol))
