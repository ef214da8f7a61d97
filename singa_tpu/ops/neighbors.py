"""Edge gather/scatter/softmax engine: row gathers + destination tables.

Round-2 replacement for the one-hot-incidence engine
(singa_tpu/ops/edge_matmul.py). That engine expressed gather/scatter as
``[B, E, N]`` dense matmuls — O(E*N*F) FLOPs per op (~20 TFLOP per gather at
the flagship shapes), which dominated the round-1 step. On this TPU a plain
row gather is 14x faster and a destination-table reduction 8x faster than the
one-hot matmuls (tools/bench_edge_engines.py), with *exact* per-destination
softmax stabilisation instead of per-graph (one-hot softmax error vs numpy:
3.4e-3; this engine: 8e-7).

Design:
  * ``gather_src/gather_dst`` — ``jnp.take`` row gathers on flat global ids.
  * ``scatter_dst`` — ``segment_sum`` (XLA scatter-add; O(E*F) work).
  * ``softmax_dst`` — per-destination max/denominator via a host-precomputed
    destination table ``edge_of[dst, k] -> edge id`` (K = max in-degree),
    then gathered back to edges. No scatter in the forward pass.
  * cost scales O(E*F) + O(N*K*H) — node-count growth is linear, unlocking
    large pockets (SURVEY §5.7) that the one-hot engine priced quadratically.

The destination table is built on the host at collate time
(``build_dst_table``) because constructing it on device would itself be a
scatter; it rides the batch pytree (singa_tpu/data/batch.py BatchTables).

Reference counterpart: torch_geometric's scatter/softmax utilities as used in
/root/reference/model/EF_layers.py:444-454,1180 — gather/scatter-add/segment
softmax over dynamic edge lists.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _table_sum(v: jax.Array, table: jax.Array) -> jax.Array:
    """Sum edge rows into table owners: v [E, ...], table [N, K] (sentinel E)
    -> f32 [N, ...]. K static row-gathers with fused accumulation — no HLO
    scatter, no [N, K, ...] materialisation, no sentinel-row concat copy
    (sentinel indices are out of bounds and fill with exact zeros)."""
    acc = None
    for k in range(table.shape[1]):
        g = jnp.take(v, table[:, k], axis=0, mode="fill", fill_value=0).astype(
            jnp.float32
        )
        acc = g if acc is None else acc + g
    return acc


@jax.custom_vjp
def _take_rows(x: jax.Array, idx: jax.Array, back_table: jax.Array) -> jax.Array:
    """jnp.take whose transpose is a table-sum instead of an HLO scatter-add
    (which cost ~20 ms per backward site in the round-2 step profile)."""
    return jnp.take(x, idx, axis=0)


def _take_rows_fwd(x, idx, back_table):
    return jnp.take(x, idx, axis=0), (idx, back_table)


def _take_rows_bwd(res, g):
    _, table = res
    dx = _table_sum(g, table).astype(g.dtype)
    return dx, None, None


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@jax.custom_vjp
def _scatter_rows(v: jax.Array, dst_idx: jax.Array, table: jax.Array) -> jax.Array:
    """Table-sum scatter with gather transpose (f32 accumulation)."""
    return _table_sum(v, table).astype(v.dtype)


def _scatter_rows_fwd(v, dst_idx, table):
    return _scatter_rows(v, dst_idx, table), dst_idx


def _scatter_rows_bwd(dst_idx, g):
    # output dtype == input dtype, so the cotangent is already right
    return jnp.take(g, dst_idx, axis=0), None, None


_scatter_rows.defvjp(_scatter_rows_fwd, _scatter_rows_bwd)


def build_dst_table(
    dst: np.ndarray, mask: np.ndarray, n_dst: int, k_max: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Host-side destination table from a padded edge list.

    Args:
      dst: [B, E] int graph-local destination of each edge slot.
      mask: [B, E] bool edge validity.
      n_dst: destination node bucket size.
      k_max: max in-degree kept per destination.

    Returns ``(edge_of [B, n_dst, k_max] int32, kept_mask [B, E], dropped)``;
    ``edge_of`` holds per-graph edge positions with sentinel ``E`` for empty
    slots. Edges beyond ``k_max`` per destination are dropped from
    ``kept_mask`` (counted in ``dropped``) so table and mask stay consistent.
    """
    B, E = dst.shape
    edge_of = np.full((B, n_dst, k_max), E, np.int32)
    kept = np.array(mask, copy=True)
    dropped = 0
    eids = np.arange(E, dtype=np.int32)
    for b in range(B):
        d = dst[b]
        m = mask[b]
        # stable sort by destination, masked slots last
        key = np.where(m, d, n_dst)
        order = np.argsort(key, kind="stable")
        ds, es = key[order], eids[order]
        valid = ds < n_dst
        ds, es = ds[valid], es[valid]
        if ds.size == 0:
            continue
        # rank within each destination segment
        starts = np.searchsorted(ds, ds, side="left")
        rank = np.arange(ds.size) - starts
        keep = rank < k_max
        if not keep.all():
            dropped += int((~keep).sum())
            kept[b, es[~keep]] = False
        edge_of[b, ds[keep], rank[keep]] = es[keep]
    return edge_of, kept, dropped


class EdgeEngine(NamedTuple):
    """Flat-index edge operations over one merged (src-set, dst-set) pair.

    All ids are *global* (graph offset folded in); padded edges point at
    row 0 but are masked to exact zeros everywhere they matter.
    """

    src_flat: jax.Array  # [B*E] int32 global source row
    dst_flat: jax.Array  # [B*E] int32 global destination row
    mask: jax.Array  # [B*E] bool
    edge_of: jax.Array  # [B*N_dst, K] int32 global edge id, sentinel B*E
    src_of: Optional[jax.Array] = None  # [B*N_src, K] source table (optional)

    @classmethod
    def create(
        cls,
        index: jax.Array,  # [B, E, 2] graph-local (src, dst)
        mask: jax.Array,  # [B, E]
        table: jax.Array,  # [B, N_dst, K] per-graph edge positions, sentinel E
        n_src: int,
        n_dst: int,
        src_table: Optional[jax.Array] = None,  # [B, N_src, K], sentinel E
    ) -> "EdgeEngine":
        B, E, _ = index.shape
        off_src = (jnp.arange(B, dtype=jnp.int32) * n_src)[:, None]
        off_dst = (jnp.arange(B, dtype=jnp.int32) * n_dst)[:, None]
        src = jnp.where(mask, index[..., 0] + off_src, 0).reshape(-1)
        dst = jnp.where(mask, index[..., 1] + off_dst, 0).reshape(-1)
        off_e = (jnp.arange(B, dtype=jnp.int32) * E)[:, None, None]
        tbl = jnp.where(table >= E, B * E, table + off_e)
        stbl = None
        if src_table is not None:
            stbl = jnp.where(src_table >= E, B * E, src_table + off_e)
            stbl = stbl.reshape(B * n_src, -1)
        return cls(src, dst, mask.reshape(-1), tbl.reshape(B * n_dst, -1), stbl)

    @property
    def num_edges(self) -> int:
        return self.src_flat.shape[0]

    @property
    def num_dst(self) -> int:
        return self.edge_of.shape[0]

    def _mask_like(self, x: jax.Array) -> jax.Array:
        return self.mask.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)

    def gather_src(self, x: jax.Array) -> jax.Array:
        """x [B*N_src, ...] -> per-edge source rows [B*E, ...] (masked zero).

        Gathers run on a FLAT 2-D view: rows of a [N, I, C] array are (8,128)
        tiles padded on both trailing dims (C=16..32 lanes -> ~4x HBM bloat),
        and row-gathering those pages ran at single-digit GB/s in the round-2
        profile. A [N, I*C] view keeps lanes ~full; the reshapes fuse into
        neighbouring elementwise work."""
        orig = x.shape[1:]
        x2 = x.reshape(x.shape[0], -1)
        if self.src_of is not None:
            out = _take_rows(x2, self.src_flat, self.src_of)
        else:
            out = jnp.take(x2, self.src_flat, axis=0)
        out = out * self.mask[:, None].astype(out.dtype)
        return out.reshape((-1,) + orig)

    def gather_dst(self, x: jax.Array) -> jax.Array:
        orig = x.shape[1:]
        x2 = x.reshape(x.shape[0], -1)
        out = _take_rows(x2, self.dst_flat, self.edge_of)
        out = out * self.mask[:, None].astype(out.dtype)
        return out.reshape((-1,) + orig)

    def scatter_dst(self, m: jax.Array) -> jax.Array:
        """Sum per-edge values into destinations: [B*E, ...] -> [B*N_dst, ...].

        Accumulates in float32 regardless of input dtype; both directions are
        gathers (table-sum forward, row-gather backward), on flat views."""
        orig = m.shape[1:]
        m2 = m.reshape(m.shape[0], -1)
        v = m2 * self.mask[:, None].astype(m2.dtype)
        out = _scatter_rows(v, self.dst_flat, self.edge_of)
        return out.reshape((-1,) + orig)

    def softmax_dst(self, logits: jax.Array, eps: float = 1e-16) -> jax.Array:
        """Per-destination softmax over incoming edges; logits [B*E, H].

        Exactly stabilised with the per-destination max via the destination
        table (the one-hot engine could only afford a per-graph max)."""
        lg = logits.astype(jnp.float32)
        lp = jnp.concatenate([lg, jnp.full((1,) + lg.shape[1:], -jnp.inf, lg.dtype)])
        g = jnp.take(lp, self.edge_of.reshape(-1), axis=0)
        g = g.reshape(self.num_dst, -1, *lg.shape[1:])  # [N, K, H]
        mx = jnp.max(g, axis=1)
        mx_safe = jnp.where(jnp.isfinite(mx), mx, 0.0)
        dn = jnp.sum(jnp.exp(g - mx_safe[:, None]), axis=1)
        # table-transpose takes: the plain-take backward is an HLO scatter-add
        mx_e = _take_rows(mx_safe, self.dst_flat, self.edge_of)
        dn_e = _take_rows(dn, self.dst_flat, self.edge_of)
        alpha = jnp.exp(lg - mx_e) / jnp.maximum(dn_e, eps)
        return (alpha * self._mask_like(alpha)).astype(logits.dtype)
