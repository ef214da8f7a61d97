"""The heterogeneous SE(3)-equivariant protein-ligand embedding.

Re-design of the reference EquivariantEmbedding
(/root/reference/model/Embedding.py:52-480): four passes over the complex —
protein intra-edges, ligand intra-edges, ligand->protein and protein->ligand
interaction edges — sharing one stack of TransBlocks, one final norm, one
sphere/atom-pair embedding set (share_atom_edge_embedding=True path).

Differences from the reference (deliberate, documented):
  * purely functional hetero passes (the reference mutates its feature dict
    in place across blocks, Embedding.py:410-427 + EF_layers.py:1352-1366);
  * the one-hot "barcode" python loop (Embedding.py:251-253) is a vectorised
    dot with powers of two;
  * edge frames are deterministic (see singa_tpu/equivariant/wigner.py);
  * everything is masked so padded nodes/edges contribute exact zeros.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.config import EmbeddingConfig
from singa_tpu.data.batch import ComplexBatch, flat_edges, flat_nodes
from singa_tpu.equivariant import so3
from singa_tpu.equivariant.attention import EdgeDegreeEmbedding, TransBlock
from singa_tpu.equivariant.layers import Embed, get_norm_layer
from singa_tpu.ops.knn import EdgeList
from singa_tpu.ops.smearing import gaussian_smearing


class EmbeddingOutput(NamedTuple):
    protein: jax.Array  # [B*Np, (lmax+1)^2, C]
    ligand: jax.Array  # [B*Nl, (lmax+1)^2, C]


def _barcode(x: jax.Array, bits: int = 15) -> jax.Array:
    """Trailing binary features -> integer id (vectorised Embedding.py:249-262)."""
    b = (x[:, -bits:] >= 0.5).astype(jnp.int32)
    powers = jnp.asarray(2 ** np.arange(bits - 1, -1, -1), jnp.int32)
    return jnp.sum(b * powers, axis=-1)


class EquivariantEmbedding(nn.Module):
    config: EmbeddingConfig

    def setup(self):
        cfg = self.config
        self.sphere_embedding = Embed(cfg.max_num_elements, cfg.sphere_channels)
        self.sphere_embedding_2 = Embed(2 ** 15, cfg.sphere_channels)
        self.source_embedding = Embed(cfg.max_num_elements, cfg.edge_channels)
        self.target_embedding = Embed(cfg.max_num_elements, cfg.edge_channels)
        edge_hidden = (cfg.edge_channels, cfg.edge_channels)
        self.edge_degree_embedding = EdgeDegreeEmbedding(
            sphere_channels=cfg.sphere_channels,
            lmax=cfg.lmax,
            mmax=cfg.mmax,
            edge_channels=edge_hidden,
            rescale_factor=cfg.avg_degree,
        )
        block_cls = nn.remat(TransBlock) if self.config.remat else TransBlock
        self.blocks = [
            block_cls(
                sphere_channels=cfg.sphere_channels,
                attn_hidden_channels=cfg.attn_hidden_channels,
                attn_alpha_channels=cfg.attn_alpha_channels,
                attn_value_channels=cfg.attn_value_channels,
                ffn_hidden_channels=cfg.ffn_hidden_channels,
                num_heads=cfg.num_heads,
                lmax=cfg.lmax,
                mmax=cfg.mmax,
                edge_channels=edge_hidden,
                norm_type=cfg.norm_type,
                name=f"block_{i}",
            )
            for i in range(cfg.num_layers)
        ]
        self.final_norm = get_norm_layer(cfg.norm_type, cfg.lmax)

    def _edge_scalars(
        self,
        pos_src: jax.Array,
        pos_dst: jax.Array,
        z_src: jax.Array,
        z_dst: jax.Array,
        edges: EdgeList,
    ):
        cfg = self.config
        vec = pos_src[edges.src] - pos_dst[edges.dst]
        dist = jnp.linalg.norm(vec, axis=-1)
        x_edge = gaussian_smearing(
            dist, 0.0, cfg.cutoff, cfg.edge_channels, cfg.basis_width_scalar
        )
        src_emb = self.source_embedding(z_src[edges.src])
        dst_emb = self.target_embedding(z_dst[edges.dst])
        x_edge = jnp.concatenate([x_edge, src_emb, dst_emb], axis=-1)
        wigner = so3.edge_wigner(vec, cfg.lmax, cfg.mmax, dtype=pos_src.dtype)
        return x_edge, wigner

    def _base_features(self, x: jax.Array, z: jax.Array) -> jax.Array:
        cfg = self.config
        scal = self.sphere_embedding(z) + self.sphere_embedding_2(_barcode(x))
        n = x.shape[0]
        out = jnp.zeros(
            (n, so3.num_coeffs(cfg.lmax), cfg.sphere_channels), scal.dtype
        )
        return out.at[:, 0, :].set(scal)

    def _intra_pass(self, x, z, pos, edges: EdgeList, num_nodes: int):
        x_edge, wigner = self._edge_scalars(pos, pos, z, z, edges)
        h = self._base_features(x, z)
        h = h + self.edge_degree_embedding(x_edge, edges, wigner, num_nodes)
        for block in self.blocks:
            h = block(h, h, x_edge, edges, wigner)
        return self.final_norm(h)

    def _inter_pass(self, h_src, h_dst, z_src, z_dst, pos_src, pos_dst, edges, num_dst):
        x_edge, wigner = self._edge_scalars(pos_src, pos_dst, z_src, z_dst, edges)
        h = h_dst + self.edge_degree_embedding(x_edge, edges, wigner, num_dst)
        for block in self.blocks:
            h = block(h_src, h, x_edge, edges, wigner)
        return self.final_norm(h)

    def __call__(self, batch: ComplexBatch, gen_mode: bool = False) -> EmbeddingOutput:
        B = batch.batch_size
        p = flat_nodes(batch.protein)
        l = flat_nodes(batch.ligand)
        np_tot = p.x.shape[0]
        nl_tot = l.x.shape[0]

        pp = flat_edges(batch.pp, batch.protein.x.shape[1], batch.protein.x.shape[1])
        h_p = self._intra_pass(p.x, p.atomic_num, p.pos, pp, np_tot)
        h_p = h_p * p.mask[:, None, None]

        if gen_mode:
            return EmbeddingOutput(protein=h_p, ligand=jnp.zeros((nl_tot,) + h_p.shape[1:], h_p.dtype))

        ll = flat_edges(batch.ll, batch.ligand.x.shape[1], batch.ligand.x.shape[1])
        h_l = self._intra_pass(l.x, l.atomic_num, l.pos, ll, nl_tot)
        h_l = h_l * l.mask[:, None, None]

        lp = flat_edges(batch.lp, batch.ligand.x.shape[1], batch.protein.x.shape[1])
        h_lp = self._inter_pass(
            h_l, h_p, l.atomic_num, p.atomic_num, l.pos, p.pos, lp, np_tot
        )
        pl = flat_edges(batch.pl, batch.protein.x.shape[1], batch.ligand.x.shape[1])
        h_pl = self._inter_pass(
            h_p, h_l, p.atomic_num, l.atomic_num, p.pos, l.pos, pl, nl_tot
        )

        h_p = (h_p + h_lp) * p.mask[:, None, None]
        h_l = (h_l + h_pl) * l.mask[:, None, None]
        return EmbeddingOutput(protein=h_p, ligand=h_l)
