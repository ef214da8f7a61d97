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
from singa_tpu.data.batch import ComplexBatch
from singa_tpu.equivariant import so3
from singa_tpu.equivariant.attention import EdgeDegreeEmbedding, TransBlock
from singa_tpu.equivariant.layers import Embed, get_norm_layer
from singa_tpu.ops.neighbors import EdgeEngine
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
        if self.config.remat:
            import jax as _jax

            policy = {
                "full": None,
                "dots": _jax.checkpoint_policies.checkpoint_dots,
                "s2": _jax.checkpoint_policies.save_anything_except_these_names(
                    "s2_grid"
                ),
                # leaner: also recompute the wide per-edge conv outputs
                # (fits batch 64 on one 16 GB chip)
                "s2x": _jax.checkpoint_policies.save_anything_except_these_names(
                    "s2_grid", "conv_wide"
                ),
            }.get(self.config.remat_policy, None)
            block_cls = nn.remat(TransBlock, policy=policy)
        else:
            block_cls = TransBlock
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
                ffn_activation=cfg.ffn_activation,
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
        edges: EdgeEngine,
    ):
        cfg = self.config
        vec = edges.gather_src(pos_src) - edges.gather_dst(pos_dst)
        dist = jnp.linalg.norm(vec, axis=-1)
        x_edge = gaussian_smearing(
            dist, 0.0, cfg.cutoff, cfg.edge_channels, cfg.basis_width_scalar
        )
        # embed all nodes once, gather per edge (matmul)
        src_emb = edges.gather_src(self.source_embedding(z_src))
        dst_emb = edges.gather_dst(self.target_embedding(z_dst))
        x_edge = jnp.concatenate(
            [x_edge.astype(src_emb.dtype), src_emb, dst_emb], axis=-1
        )
        frame = so3.edge_frame(vec)
        return x_edge, frame

    def _base_features(self, x: jax.Array, z: jax.Array) -> jax.Array:
        cfg = self.config
        scal = self.sphere_embedding(z) + self.sphere_embedding_2(_barcode(x))
        # one-hot outer product instead of .at[:, 0].set on zeros (scatter)
        e0 = jnp.asarray(
            np.eye(so3.num_coeffs(cfg.lmax), 1, dtype=np.float32), scal.dtype
        )
        return e0[None] * scal[:, None, :]

    def _intra_pass(self, x, z, pos, edges: EdgeEngine):
        x_edge, wigner = self._edge_scalars(pos, pos, z, z, edges)
        h = self._base_features(x, z)
        h = h + self.edge_degree_embedding(x_edge, edges, wigner)
        for block in self.blocks:
            h = block(h, h, x_edge, edges, wigner)
        return self.final_norm(h)

    def _inter_pass(self, h_src, h_dst, z_src, z_dst, pos_src, pos_dst, edges):
        x_edge, wigner = self._edge_scalars(pos_src, pos_dst, z_src, z_dst, edges)
        h = h_dst + self.edge_degree_embedding(x_edge, edges, wigner)
        for block in self.blocks:
            h = block(h_src, h, x_edge, edges, wigner)
        return self.final_norm(h)

    def __call__(self, batch: ComplexBatch, gen_mode: bool = False) -> EmbeddingOutput:
        """Runs the reference's four passes as two merged stages.

        Protein-intra and ligand-intra are independent, as are the two
        interaction directions, so each pair executes as one pass over a
        combined [protein; ligand] node set with a block-diagonal /
        cross-directional edge set — identical math (the shared TransBlocks
        see the union of edges of the two passes), half the kernel launches
        and double the tensor occupancy.
        """
        if batch.tables is None:
            raise ValueError(
                "batch lacks destination tables; build batches through "
                "singa_tpu.data (or call singa_tpu.data.batch.attach_tables)"
            )
        B = batch.batch_size
        n_p = batch.protein.x.shape[1]
        n_l = batch.ligand.x.shape[1]
        n_c = n_p + n_l
        # combined per-graph node set: [protein(0..n_p); ligand(n_p..n_c)]
        cx = jnp.concatenate([batch.protein.x, batch.ligand.x], axis=1).reshape(
            B * n_c, -1
        )
        cpos = jnp.concatenate([batch.protein.pos, batch.ligand.pos], axis=1).reshape(
            B * n_c, 3
        )
        cz = jnp.concatenate(
            [batch.protein.atomic_num, batch.ligand.atomic_num], axis=1
        ).reshape(B * n_c)
        cmask = jnp.concatenate([batch.protein.mask, batch.ligand.mask], axis=1).reshape(
            B * n_c
        )

        # stage 1: both intra edge sets, block-diagonal
        intra_idx = jnp.concatenate(
            [batch.pp.index, batch.ll.index + n_p], axis=1
        )
        intra_mask = jnp.concatenate([batch.pp.mask, batch.ll.mask], axis=1)
        intra = EdgeEngine.create(
            intra_idx, intra_mask, batch.tables.intra, n_c, n_c,
            src_table=batch.tables.intra_src,
        )
        h = self._intra_pass(cx, cz, cpos, intra)
        h = h * cmask[:, None, None]

        if gen_mode:
            # protein-only embedding for generation (reference gen_mode,
            # Embedding.py:297-298); interaction edges are empty by input.
            hb = h.reshape(B, n_c, *h.shape[1:])
            return EmbeddingOutput(
                protein=hb[:, :n_p].reshape(B * n_p, *h.shape[1:]),
                ligand=hb[:, n_p:].reshape(B * n_l, *h.shape[1:]),
            )

        # stage 2: both interaction directions (l->p and p->l)
        lp_idx = jnp.stack(
            [batch.lp.index[..., 0] + n_p, batch.lp.index[..., 1]], axis=-1
        )
        pl_idx = jnp.stack(
            [batch.pl.index[..., 0], batch.pl.index[..., 1] + n_p], axis=-1
        )
        inter_idx = jnp.concatenate([lp_idx, pl_idx], axis=1)
        inter_mask = jnp.concatenate([batch.lp.mask, batch.pl.mask], axis=1)
        inter = EdgeEngine.create(
            inter_idx, inter_mask, batch.tables.inter, n_c, n_c,
            src_table=batch.tables.inter_src,
        )
        h_inter = self._inter_pass(h, h, cz, cz, cpos, cpos, inter)

        h_out = (h + h_inter) * cmask[:, None, None]
        hb = h_out.reshape(B, n_c, *h_out.shape[1:])
        h_p = hb[:, :n_p].reshape(B * n_p, *h_out.shape[1:])
        h_l = hb[:, n_p:].reshape(B * n_l, *h_out.shape[1:])
        return EmbeddingOutput(protein=h_p, ligand=h_l)
