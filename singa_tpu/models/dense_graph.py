"""Dense-form edge-conditioned graph attention for the CProMG encoders.

Mathematically identical to GraphMHA over the kNN-closure + Laplacian graph
(reference CProMG.py:19-78,293-298) but mapped to dense masked [B, N, N]
tensors: on TPU, scatter/segment primitives serialise badly while dense
einsums ride the MXU/VPU. Two exact algebraic rewrites make this cheap:

  * score_ij = q_i . W(w_ij * k_j) + q_i . b  — the bias term is constant
    per query row, softmax-invariant, so it is dropped;
    with q~ = W^T q the score is einsum('bihd,bjhd,bijd->bhij', q~, k, w).
  * out_i = sum_j a_ij (W(w_ij * v_j) + b) = W(sum_j a_ij w_ij * v_j) + b —
    the linear map commutes with the convex aggregation.

The Laplacian edge transform (off-diagonal -smear(d), diagonal = degree) is
applied by evaluating the edge MLP on the off-diagonal attr for all pairs and
on the degree vector for the diagonal slot.
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


class DenseGraph(NamedTuple):
    dist: jax.Array  # [B, N, N] pair distances (f32)
    adj: jax.Array  # [B, N, N] bool, symmetric kNN closure (no self)
    deg_attr: jax.Array  # [B, N, De] Laplacian diagonal (degree) attr
    node_mask: jax.Array  # [B, N]
    # NEGATED smeared distances (the Laplacian off-diagonal attr the edge
    # MLPs consume directly), computed ONCE and shared by all encoder layers:
    # per-layer recomputation — and a separate negation copy — kept 3 of
    # these [B, N, N, De] tensors (~1.1 GB each at batch 64) live at once
    # and OOMed the flagship batch
    neg_smear: jax.Array | None = None  # [B, N, N, De]


def build_dense_graph(
    pos: jax.Array,
    mask: jax.Array,
    k: int,
    smear_stop: float,
    edge_channels: int,
) -> DenseGraph:
    B, N, _ = pos.shape
    # directed kNN as a distance-threshold test against the k-th smallest
    # row distance — O(N^2) elementwise, replacing the round-1 one-hot
    # construction whose [B, N, k, N] tensor cost ~900 MB at the flagship
    # shapes. Ties at the k-th distance admit both neighbours (measure-zero
    # difference vs exact top-k index sets).
    n2 = jnp.sum(pos * pos, axis=-1)
    d2 = n2[:, :, None] - 2.0 * jnp.einsum("bnc,bmc->bnm", pos, pos) + n2[:, None, :]
    d2 = jnp.maximum(d2, 0.0)
    valid_pair = mask[:, :, None] & mask[:, None, :]
    eye = jnp.eye(N, dtype=bool)[None]
    big = jnp.asarray(1e30, d2.dtype)
    d2m = jnp.where(valid_pair & ~eye, d2, big)
    kth = -jax.lax.top_k(-d2m, k)[0][..., -1:]  # [B, N, 1]
    adj_dir = (d2m <= kth) & (d2m < big)
    adj = adj_dir | jnp.swapaxes(adj_dir, 1, 2)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    from singa_tpu.dtypes import compute_dtype

    neg_smear = -gaussian_smearing(dist, 0.0, smear_stop, edge_channels).astype(
        compute_dtype()
    )
    deg = -(neg_smear * adj[..., None]).sum(axis=2)  # [B, N, De]
    return DenseGraph(
        dist=dist, adj=adj, deg_attr=deg, node_mask=mask, neg_smear=neg_smear
    )


class DenseGraphMHA(nn.Module):
    """Drop-in dense equivalent of GraphMHA (parameter-compatible shapes)."""

    hidden_channels: int
    key_channels: int
    num_heads: int
    edge_channels: int
    smear_stop: float

    @nn.compact
    def __call__(self, x: jax.Array, g: DenseGraph) -> jax.Array:
        B, N, C = x.shape
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

        # edge MLPs on the Laplacian attrs; off-diagonal entries are -smear
        if g.neg_smear is not None:
            neg_smear = g.neg_smear.astype(dt)
        else:
            neg_smear = -gaussian_smearing(
                g.dist, 0.0, self.smear_stop, self.edge_channels
            ).astype(dt)
        wk_net = EdgeMLP(kd, name="weight_k_net")
        wv_net = EdgeMLP(vd, name="weight_v_net")
        w_k_off = wk_net(neg_smear)  # [B, N, N, kd]
        w_v_off = wv_net(neg_smear)
        w_k_diag = wk_net(g.deg_attr.astype(dt))  # [B, N, kd]
        w_v_diag = wv_net(g.deg_attr.astype(dt))

        # fold W_k_lin into the query (bias is softmax-invariant, dropped)
        wk_kernel = self.param(
            "weight_k_lin_kernel", torch_linear_kernel_init, (kd, kd)
        )
        # q~_d = sum_e K[d, e] q_e   (flax kernel layout is [in, out]:
        # keys_j = (w*k_j) @ K, so score = q . ((w*k_j) @ K) = (K @ q) . (w*k_j))
        q_tilde = jnp.einsum("bnhe,de->bnhd", q, wk_kernel.astype(dt))

        scores_off = jnp.einsum("bihd,bjhd,bijd->bhij", q_tilde, k, w_k_off)
        scores_diag = jnp.einsum("bihd,bihd,bid->bhi", q_tilde, k, w_k_diag)
        scale = 1.0 / np.sqrt(kd)
        eye = jnp.eye(N, dtype=bool)
        attn_domain = (g.adj | eye[None]) & g.node_mask[:, None, :] & g.node_mask[:, :, None]
        scores = jnp.where(attn_domain[:, None], scores_off * scale, -1e9)
        scores = jnp.where(
            eye[None, None], scores_diag[:, :, :, None] * scale, scores
        )
        # re-block diagonal entries of padded nodes
        scores = jnp.where(
            g.node_mask[:, None, :, None] & g.node_mask[:, None, None, :],
            scores,
            -1e9,
        )
        alpha = jax.nn.softmax(scores, axis=-1)  # [B, H, N, N]

        alpha_off = jnp.where(eye[None, None], 0.0, alpha)
        alpha_diag = jnp.einsum("bhii->bhi", alpha)
        agg = jnp.einsum("bhij,bijd,bjhd->bihd", alpha_off.astype(dt), w_v_off, v)
        agg = agg + alpha_diag.transpose(0, 2, 1)[..., None].astype(dt) * (
            w_v_diag[:, :, None, :] * v
        )
        agg = Linear(vd, name="weight_v_lin")(agg)  # bias commutes with the sum
        aggr = agg.reshape(B, N, H * vd)

        out = Linear(self.hidden_channels, name="centroid_lin")(x) + aggr
        out = Linear(self.hidden_channels, name="out_transform")(shifted_softplus(out))
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out)
        return out * g.node_mask[..., None]


class DenseEncoderLayer(nn.Module):
    cfg: EncoderConfig
    smear_stop: float

    @nn.compact
    def __call__(self, x, g: DenseGraph):
        msa = DenseGraphMHA(
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
