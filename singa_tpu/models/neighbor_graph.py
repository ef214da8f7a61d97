"""Neighbor-list (gather-form) edge-conditioned graph attention.

Round-2 replacement for the dense [B, N, N] form (models/dense_graph.py) in
the CProMG encoders: mathematically the SAME attention (score/value rewrites
documented there; reference CProMG.py:19-78,293-298), but every pair tensor
lives on a fixed [B, N, K] in-neighbor axis instead of the full N x N grid.
At the flagship shapes (N=448, k=48, K=96) that cuts the edge-MLP and
score/aggregate traffic ~4.6x — the dense form's [B, N, N, 64] tensors were
~820 MB each and the encoders cost ~250 ms/step in the round-2 profile.

Parameter names/shapes are IDENTICAL to DenseGraphMHA (and to the segment
GraphMHA), so the three forms are interchangeable under one param dict and
parity-tested against each other (tests/test_dense_graph.py).

K defaults to 2k: a node's in-neighborhood in the symmetrised kNN graph is
its own k nearest plus everyone who chose it; beyond-2k in-degrees are
geometrically rare (kissing-number regime) and overflow neighbours are
dropped deterministically (lowest index kept), with the degree attr computed
over the kept set so softmax weights stay exactly normalised.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.config import EncoderConfig
from singa_tpu.dtypes import compute_dtype
from singa_tpu.equivariant.layers import Linear, torch_linear_kernel_init
from singa_tpu.models.cpromg import EdgeMLP, PositionwiseFFN, shifted_softplus
from singa_tpu.ops.smearing import gaussian_smearing


class NeighborGraph(NamedTuple):
    nbr: jax.Array  # [B, N, K] int32 in-neighbor indices (graph-local)
    nbr_mask: jax.Array  # [B, N, K] bool
    dist: jax.Array  # [B, N, K] f32 distances to those neighbours
    deg_attr: jax.Array  # [B, N, De] Laplacian diagonal (degree) attr
    node_mask: jax.Array  # [B, N]
    neg_smear: jax.Array | None = None  # [B, N, K, De] shared across layers
    # masked dense pair distances for the gather-free dense kernel
    # (ops/pallas/dense_edge_attn.py): real distance where j is an
    # in-neighbour of i, BIG elsewhere (incl. diagonal / invalid nodes)
    adj_dist: jax.Array | None = None  # [B, N, N] f32


def build_neighbor_graph(
    pos: jax.Array,
    mask: jax.Array,
    k: int,
    smear_stop: float,
    edge_channels: int,
    k_in: int | None = None,
    with_adj_dist: bool = False,
) -> NeighborGraph:
    """Symmetrised threshold-kNN as per-node neighbour lists (no N x N attr)."""
    B, N, _ = pos.shape
    K = min(k_in or 2 * k, N)
    n2 = jnp.sum(pos * pos, axis=-1)
    d2 = n2[:, :, None] - 2.0 * jnp.einsum("bnc,bmc->bnm", pos, pos) + n2[:, None, :]
    d2 = jnp.maximum(d2, 0.0)
    valid_pair = mask[:, :, None] & mask[:, None, :]
    eye = jnp.eye(N, dtype=bool)[None]
    big = jnp.asarray(1e30, d2.dtype)
    d2m = jnp.where(valid_pair & ~eye, d2, big)
    kth = -jax.lax.top_k(-d2m, k)[0][..., -1:]
    adj_dir = (d2m <= kth) & (d2m < big)
    adj = adj_dir | jnp.swapaxes(adj_dir, 1, 2)
    # per-row top-K of the 0/1 adjacency: row-stable, keeps lowest indices
    val, nbr = jax.lax.top_k(adj.astype(jnp.float32), K)
    nbr_mask = val > 0.5
    dist_full = jnp.sqrt(jnp.maximum(d2, 1e-12))
    # one-hot contraction instead of take_along_axis (15 ms in the profile:
    # XLA row-gathers of [B, N, N] pages are slow; the one-hot is generated
    # in-fusion and the reduction is a cheap 1.2 GF contraction)
    onehot = (
        nbr[..., None] == jnp.arange(N, dtype=nbr.dtype)[None, None, None]
    ).astype(dist_full.dtype)
    dist = jnp.einsum("bikn,bin->bik", onehot, dist_full)
    from singa_tpu.dtypes import compute_dtype

    neg_smear = -gaussian_smearing(dist, 0.0, smear_stop, edge_channels).astype(
        compute_dtype()
    )
    deg = -(neg_smear * nbr_mask[..., None]).sum(axis=2)
    adj_dist = None
    if with_adj_dist:
        from singa_tpu.ops.pallas.dense_edge_attn import BIG

        adj_dist = jnp.where(adj, dist_full, jnp.asarray(BIG, dist_full.dtype))
    return NeighborGraph(
        nbr=nbr,
        nbr_mask=nbr_mask,
        dist=dist,
        deg_attr=deg,
        node_mask=mask,
        neg_smear=neg_smear,
        adj_dist=adj_dist,
    )


def _force_fused_attn() -> bool:
    """Test hook: run the fused kernel (interpret mode) off-TPU."""
    import os

    return bool(os.environ.get("SINGA_TPU_FORCE_FUSED_ATTN"))


def _dense_attn() -> bool:
    """Select the gather-free dense kernel (ops/pallas/dense_edge_attn.py)
    over the one-hot fused form; SINGA_TPU_DENSE_ATTN=0 restores the
    one-hot kernel. Default OFF until the hardware A/B lands."""
    import os

    return os.environ.get("SINGA_TPU_DENSE_ATTN", "0") not in ("0", "")


def _hybrid_attn() -> bool:
    """Select the hybrid kernel (XLA DMA gathers outside, pair math in VMEM —
    ops/pallas/neighbor_attn.py) instead of the all-in-kernel fused form."""
    import os

    # default OFF until measured faster on hardware (flip after bench)
    return os.environ.get("SINGA_TPU_HYBRID_ATTN", "0") not in ("0", "")


class NeighborGraphMHA(nn.Module):
    """Drop-in gather-form equivalent of DenseGraphMHA (same params)."""

    hidden_channels: int
    key_channels: int
    num_heads: int
    edge_channels: int
    smear_stop: float

    @nn.compact
    def __call__(self, x: jax.Array, g: NeighborGraph) -> jax.Array:
        B, N, C = x.shape
        K = g.nbr.shape[2]
        H = self.num_heads
        kd = self.key_channels // H
        vd = self.hidden_channels // H
        dt = compute_dtype()

        def grouped(name, features):
            bound = 1.0 / np.sqrt(C // H)
            w = self.param(
                name, lambda k_, s: jax.random.uniform(k_, s, jnp.float32, -bound, bound),
                (H, C // H, features // H),
            )
            return jnp.einsum(
                "bnhc,hco->bnho", x.reshape(B, N, H, C // H).astype(dt), w.astype(dt)
            )

        q = grouped("q_lin", self.key_channels)  # [B, N, H, kd]
        k = grouped("k_lin", self.key_channels)
        v = grouped("v_lin", self.hidden_channels)  # [B, N, H, vd]

        wk_net = EdgeMLP(kd, name="weight_k_net")
        wv_net = EdgeMLP(vd, name="weight_v_net")
        w_k_diag = wk_net(g.deg_attr.astype(dt))  # [B, N, kd]
        w_v_diag = wv_net(g.deg_attr.astype(dt))

        wk_kernel = self.param(
            "weight_k_lin_kernel", torch_linear_kernel_init, (kd, kd)
        )
        q_tilde = jnp.einsum("bnhe,de->bnhd", q, wk_kernel.astype(dt))
        scale = 1.0 / np.sqrt(kd)
        scores_diag = (q_tilde * w_k_diag[:, :, None, :] * k).sum(-1) * scale
        neg = jnp.asarray(-1e9, jnp.float32)
        s_diag = jnp.where(
            g.node_mask[..., None], scores_diag.astype(jnp.float32), neg
        )

        from singa_tpu.equivariant.layers import _use_pallas

        if g.adj_dist is not None and (_use_pallas() or _force_fused_attn()):
            # gather-free dense kernel (round 5): the kNN mask + distances
            # ride one [B, N, N] tensor; no one-hot gathers anywhere and the
            # backward dk/dv are plain reductions (ops/pallas/dense_edge_attn)
            from singa_tpu.ops.pallas.dense_edge_attn import dense_edge_attn

            p = self.variables["params"]
            ek = p["weight_k_net"]
            ev = p["weight_v_net"]
            width = self.smear_stop / (self.edge_channels - 1)
            coeff = -0.5 / (width * width)
            centers = jnp.linspace(
                0.0, self.smear_stop, self.edge_channels, dtype=jnp.float32
            )
            diag_value = (w_v_diag[:, :, None, :] * v).reshape(B, N, H * vd)
            agg = dense_edge_attn(
                q_tilde.reshape(B, N, H * kd),
                k.reshape(B, N, H * kd),
                v.reshape(B, N, H * vd),
                g.adj_dist.astype(jnp.float32),
                s_diag,
                diag_value,
                centers,
                ek["Linear_0"]["Dense_0"]["kernel"],
                ek["Linear_0"]["Dense_0"]["bias"],
                ek["Linear_1"]["Dense_0"]["kernel"],
                ek["Linear_1"]["Dense_0"]["bias"],
                ev["Linear_0"]["Dense_0"]["kernel"],
                ev["Linear_0"]["Dense_0"]["bias"],
                ev["Linear_1"]["Dense_0"]["kernel"],
                ev["Linear_1"]["Dense_0"]["bias"],
                float(coeff),
                jax.default_backend() != "tpu",
            ).reshape(B, N, H, vd)
        elif _use_pallas() or _force_fused_attn():
            # fused kernel: smear + both EdgeMLPs + one-hot gathers + softmax
            # + aggregate in VMEM (ops/pallas/neighbor_attn.py); hybrid form
            # moves the gathers to XLA DMA outside the kernel
            from singa_tpu.ops.pallas.neighbor_attn import (
                neighbor_attn_fused,
                neighbor_attn_hybrid,
            )

            attn_fn = neighbor_attn_hybrid if _hybrid_attn() else neighbor_attn_fused

            p = self.variables["params"]
            ek = p["weight_k_net"]
            ev = p["weight_v_net"]
            width = self.smear_stop / (self.edge_channels - 1)
            coeff = -0.5 / (width * width)
            centers = jnp.linspace(
                0.0, self.smear_stop, self.edge_channels, dtype=jnp.float32
            )
            diag_value = (w_v_diag[:, :, None, :] * v).reshape(B, N, H * vd)
            agg = attn_fn(
                q_tilde.reshape(B, N, H * kd),
                k.reshape(B, N, H * kd),
                v.reshape(B, N, H * vd),
                g.nbr,
                g.nbr_mask,
                g.dist.astype(jnp.float32),
                s_diag,
                diag_value,
                centers,
                ek["Linear_0"]["Dense_0"]["kernel"],
                ek["Linear_0"]["Dense_0"]["bias"],
                ek["Linear_1"]["Dense_0"]["kernel"],
                ek["Linear_1"]["Dense_0"]["bias"],
                ev["Linear_0"]["Dense_0"]["kernel"],
                ev["Linear_0"]["Dense_0"]["bias"],
                ev["Linear_1"]["Dense_0"]["kernel"],
                ev["Linear_1"]["Dense_0"]["bias"],
                float(coeff),
                jax.default_backend() != "tpu",
            ).reshape(B, N, H, vd)
        else:
            if g.neg_smear is not None:
                neg_smear = g.neg_smear.astype(dt)
            else:
                neg_smear = -gaussian_smearing(
                    g.dist, 0.0, self.smear_stop, self.edge_channels
                ).astype(dt)
            w_k_off = wk_net(neg_smear)  # [B, N, K, kd]
            w_v_off = wv_net(neg_smear)

            # neighbour rows via ONE-HOT matmuls: XLA row-gathers ran at
            # ~2.6 GB/s here (round-2 profile); the [B, N, K, N] one-hot is
            # generated inside the convolution fusion from an iota-compare
            # and the contraction rides the MXU.
            onehot = (
                g.nbr[..., None]
                == jnp.arange(N, dtype=g.nbr.dtype)[None, None, None]
            ).astype(dt)

            def take_nodes(t):  # [B, N, H, d] -> [B, N, K, H, d]
                d = t.shape[-1]
                tf = t.reshape(B, N, H * d)
                gathered = jnp.einsum("bikn,bnf->bikf", onehot, tf)
                return gathered.reshape(B, N, K, H, d)

            k_nb = take_nodes(k)
            v_nb = take_nodes(v)
            scores_off = (
                q_tilde[:, :, None, :, :] * w_k_off[:, :, :, None, :] * k_nb
            ).sum(-1) * scale  # [B, N, K, H]
            s_off = jnp.where(
                g.nbr_mask[..., None], scores_off.astype(jnp.float32), neg
            )
            s = jnp.concatenate([s_off, s_diag[:, :, None, :]], axis=2)
            alpha = jax.nn.softmax(s, axis=2).astype(dt)
            a_off, a_diag = alpha[:, :, :K], alpha[:, :, K]

            agg = (
                a_off[..., None] * w_v_off[:, :, :, None, :] * v_nb
            ).sum(axis=2)  # [B, N, H, vd]
            agg = agg + a_diag[..., None] * (w_v_diag[:, :, None, :] * v)
        agg = Linear(vd, name="weight_v_lin")(agg)
        aggr = agg.reshape(B, N, H * vd)

        out = Linear(self.hidden_channels, name="centroid_lin")(x) + aggr
        out = Linear(self.hidden_channels, name="out_transform")(shifted_softplus(out))
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out)
        return out * g.node_mask[..., None]


class NeighborEncoderLayer(nn.Module):
    cfg: EncoderConfig
    smear_stop: float

    @nn.compact
    def __call__(self, x, g: NeighborGraph):
        msa = NeighborGraphMHA(
            self.cfg.hidden_channels,
            self.cfg.key_channels,
            self.cfg.num_heads,
            self.cfg.edge_channels,
            self.smear_stop,
            name="enc_self_attn",
        )(x, g)
        ffn = PositionwiseFFN(
            self.cfg.hidden_channels, self.cfg.ffn_hidden, name="pos_ffn"
        )(msa)
        return msa, ffn
