"""Discriminators for the adversarial loop.

The reference's Discriminator.py/Generator.py are empty placeholders; its only
discriminator code is a GIN prototype (/root/reference/model/vanilla/
vanillaModel.py:144-180). Here that design is promoted to first-class:

* ``GINDiscriminator`` — graph-level real/fake score over ligand molecular
  graphs (GIN convolutions + sum pooling + MLP), for data-side adversarial
  training and affinity-aware scoring.
* ``SeqDiscriminator`` — token-sequence discriminator (transformer encoder +
  masked mean pool), enabling a fully on-device SeqGAN-style loop where the
  generator's samples never need host-side 3D reconstruction.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from singa_tpu.config import PAD_TOKEN
from singa_tpu.equivariant.layers import Linear
from singa_tpu.models.cpromg import sinusoidal_pe
from singa_tpu.ops.knn import EdgeList
from singa_tpu.ops.segment import segment_sum


class GINConv(nn.Module):
    """x' = MLP((1 + eps) x + sum_neighbors x_j); eps fixed at 0
    (train_eps=False in the prototype, vanillaModel.py:155)."""

    hidden: int

    @nn.compact
    def __call__(self, x, edges: EdgeList, num_nodes: int):
        agg = segment_sum(x[edges.src], edges.dst, num_nodes, mask=edges.mask)
        h = x + agg
        h = Linear(self.hidden)(h)
        h = nn.relu(h)
        h = Linear(self.hidden)(h)
        return h


class GINDiscriminator(nn.Module):
    hidden: int = 128
    out_channels: int = 64
    num_layers: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, N, F] node features
        node_mask: jax.Array,  # [B, N]
        edges: EdgeList,  # flat over B*N
        deterministic: bool = True,
    ) -> jax.Array:
        B, N, _ = x.shape
        h = x.reshape(B * N, -1)
        for i in range(self.num_layers):
            h = nn.relu(GINConv(self.hidden, name=f"conv_{i}")(h, edges, B * N))
        h = h * node_mask.reshape(-1, 1)
        pooled = h.reshape(B, N, -1).sum(axis=1)  # global_add_pool
        g = nn.relu(Linear(self.hidden, name="mlp_1")(pooled))
        g = nn.Dropout(self.dropout, deterministic=deterministic)(g)
        g = Linear(self.out_channels, name="mlp_2")(g)
        logit = Linear(1, name="head")(g)
        return logit[:, 0]  # raw logit; sigmoid at the loss


class GINDiscriminatorDense(nn.Module):
    """GIN over a dense adjacency [B, N, N] (agg = A @ h).

    Same architecture as GINDiscriminator but differentiable in both the node
    features and the adjacency — the form WGAN-GP needs to take gradients at
    interpolated graphs (the reference's intended graph-level scoring
    direction, vanilla/vanillaModel.py:144-180, finished here)."""

    hidden: int = 128
    out_channels: int = 64
    num_layers: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, N, F]
        adj: jax.Array,  # [B, N, N] float (0/1 or interpolated)
        node_mask: jax.Array,  # [B, N]
        deterministic: bool = True,
    ) -> jax.Array:
        m = node_mask.astype(x.dtype)[..., None]
        h = x * m
        for i in range(self.num_layers):
            agg = jnp.einsum("bnm,bmf->bnf", adj, h)
            h = h + agg
            h = nn.relu(Linear(self.hidden, name=f"conv_{i}_1")(h))
            h = Linear(self.hidden, name=f"conv_{i}_2")(h)
            h = nn.relu(h) * m
        pooled = h.sum(axis=1)  # global_add_pool (vanillaModel.py:170)
        g = nn.relu(Linear(self.hidden, name="mlp_1")(pooled))
        g = nn.Dropout(self.dropout, deterministic=deterministic)(g)
        g = Linear(self.out_channels, name="mlp_2")(g)
        return Linear(1, name="head")(g)[:, 0]


class SeqDiscriminator(nn.Module):
    vocab_size: int
    hidden: int = 256
    num_layers: int = 4
    num_heads: int = 4
    pad_token: int = PAD_TOKEN

    @nn.compact
    def __call__(self, token_onehot_or_ids: jax.Array, deterministic: bool = True):
        """Accepts int token ids [B, T] or soft one-hots [B, T, V]
        (the latter keeps the generator differentiable via Gumbel-softmax)."""
        emb_table = self.param(
            "embedding", nn.initializers.normal(1.0), (self.vocab_size, self.hidden)
        )
        if token_onehot_or_ids.ndim == 2:
            x = jnp.take(emb_table, token_onehot_or_ids, axis=0)
            pad_mask = token_onehot_or_ids == self.pad_token
        else:
            x = jnp.einsum("btv,vc->btc", token_onehot_or_ids, emb_table)
            pad_mask = token_onehot_or_ids[..., self.pad_token] > 0.5
        B, T = x.shape[:2]
        x = x + sinusoidal_pe(T, self.hidden, x.dtype)[None]
        attn_mask = ~pad_mask[:, None, None, :]  # [B, 1, 1, T]
        for i in range(self.num_layers):
            y = nn.LayerNorm()(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"attn_{i}"
            )(y, y, mask=attn_mask)
            x = x + y
            y = nn.LayerNorm()(x)
            y = Linear(self.hidden * 2)(y)
            y = nn.gelu(y)
            y = Linear(self.hidden)(y)
            x = x + y
        keep = (~pad_mask).astype(x.dtype)[..., None]
        pooled = (x * keep).sum(1) / jnp.maximum(keep.sum(1), 1.0)
        return Linear(1, name="head")(nn.LayerNorm()(pooled))[:, 0]
