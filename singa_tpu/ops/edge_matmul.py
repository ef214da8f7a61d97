"""Edge gather/scatter/softmax as batched one-hot matmuls.

On TPU, unsorted gather/scatter primitives serialise; with fixed per-graph
edge buckets the same operations are small dense matmuls that ride the MXU
and whose backward passes are also matmuls. This is the edge-op engine for
the equivariant embedding (the CProMG encoders use the fully dense [B,N,N]
form in singa_tpu/models/dense_graph.py).

``MatmulEdges`` precomputes masked one-hot incidence matrices
[B, E, N_src] / [B, E, N_dst] from graph-local edge indices; padded edges
have all-zero rows and are inert everywhere.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MatmulEdges(NamedTuple):
    src_oh: jax.Array  # [B, E, N_src] 0/1, masked
    dst_oh: jax.Array  # [B, E, N_dst]
    mask: jax.Array  # [B, E] bool

    @property
    def batch(self) -> int:
        return self.src_oh.shape[0]

    @property
    def num_edges(self) -> int:
        return self.src_oh.shape[1]

    @classmethod
    def create(cls, index: jax.Array, mask: jax.Array, n_src: int, n_dst: int):
        """index: [B, E, 2] graph-local (src, dst); mask: [B, E]."""
        m = mask[..., None]
        src = jax.nn.one_hot(index[..., 0], n_src, dtype=jnp.float32) * m
        dst = jax.nn.one_hot(index[..., 1], n_dst, dtype=jnp.float32) * m
        return cls(src_oh=src, dst_oh=dst, mask=mask)

    # ---- flat [B*N, ...] <-> [B*E, ...] ----

    def _gather(self, oh: jax.Array, x: jax.Array) -> jax.Array:
        B, E, N = oh.shape
        xf = x.reshape(B, N, -1)
        # row selection is exact in any dtype; keep f32 inputs bit-exact
        prec = (
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        out = jnp.einsum("ben,bnf->bef", oh.astype(x.dtype), xf, precision=prec)
        return out.reshape(B * E, *x.shape[1:])

    def gather_src(self, x: jax.Array) -> jax.Array:
        """x [B*N_src, ...] -> per-edge source features [B*E, ...]."""
        return self._gather(self.src_oh, x)

    def gather_dst(self, x: jax.Array) -> jax.Array:
        return self._gather(self.dst_oh, x)

    def scatter_dst(self, m: jax.Array) -> jax.Array:
        """Sum per-edge values into their destination: [B*E, ...] ->
        [B*N_dst, ...]. Accumulates in float32 (free on the MXU)."""
        B, E, N = self.dst_oh.shape
        mf = m.reshape(B, E, -1)
        out = jnp.einsum(
            "ben,bef->bnf",
            self.dst_oh.astype(m.dtype),
            mf,
            preferred_element_type=jnp.float32,
        ).astype(m.dtype)
        return out.reshape(B * N, *m.shape[1:])

    def softmax_dst(self, logits: jax.Array, eps: float = 1e-16) -> jax.Array:
        """Per-destination softmax over incoming edges; logits [B*E, H].

        Stabilised with a per-graph max (not per-destination — a dense
        per-dst max would need an [B, N, E] tensor); attention logits are
        layer-normed upstream so the per-graph range is small.
        """
        B, E, _ = self.dst_oh.shape
        lg = logits.astype(jnp.float32).reshape(B, E, -1)
        neg = jnp.asarray(-1e30, lg.dtype)
        masked = jnp.where(self.mask[..., None], lg, neg)
        gmax = jax.lax.stop_gradient(jnp.max(masked, axis=1, keepdims=True))
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
        e = jnp.exp(lg - gmax) * self.mask[..., None]
        denom = jnp.einsum("ben,beh->bnh", self.dst_oh, e)
        denom_e = jnp.einsum("ben,bnh->beh", self.dst_oh, denom)
        alpha = e / jnp.maximum(denom_e, eps)
        return alpha.reshape(logits.shape).astype(logits.dtype)
