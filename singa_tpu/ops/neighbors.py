"""Edge gather/scatter/softmax engine: per-graph one-hot matmuls (default)
with a destination-table fallback.

The DEFAULT engine expresses gather/scatter/softmax as *per-graph batched*
one-hot contractions ``[B, E, N] x [B, N, F]`` — ~20 GFLOP total at the
flagship shapes, sub-ms on the MXU, and every transpose is again a matmul,
so no HLO scatters appear anywhere (round-3 finding: XLA row gathers on this
chip run far below DMA bandwidth and their transposes are scatter-adds,
~43 ms/step of the batch-32 flagship profile). All one-hot contractions run
at ``Precision.HIGHEST`` so f32 operands are NOT rounded to bf16 — with the
3-pass f32 decomposition a gather-by-one-hot reproduces ``jnp.take`` to f32
rounding (bf16 operands are single-pass and exact either way).

The FALLBACK (``SINGA_TPU_EDGE_TABLE=1``) is the round-2 row-gather engine:
  * ``gather_src/gather_dst`` — ``jnp.take`` row gathers on flat global ids
    with destination-table transposes (custom VJPs, no HLO scatter).
  * ``softmax_dst`` — per-destination max/denominator via a host-precomputed
    destination table ``edge_of[dst, k] -> edge id`` (K = max in-degree).
  * cost scales O(E*F) + O(N*K*H) — node-count growth is linear, relevant
    for pockets large enough that the one-hot O(E*N) FLOPs stop being free
    (SURVEY §5.7; tools/bench_edge_engines.py measures the crossover).

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
    acc_t = jnp.promote_types(v.dtype, jnp.float32)  # f32 accumulation (f64 stays f64)
    acc = None
    for k in range(table.shape[1]):
        g = jnp.take(v, table[:, k], axis=0, mode="fill", fill_value=0).astype(acc_t)
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


def _use_onehot(n: Optional[int] = None) -> bool:
    """Engine choice, SHAPE-DRIVEN per edge op (round-4; the round-3 form
    was a global env switch).

    One-hot matmul gathers/scatters are the default engine below
    ``SINGA_TPU_ONEHOT_MAX_N`` nodes per graph; the table engine takes over
    above it. Round-3 finding: XLA row gathers on this chip run far below
    DMA bandwidth and their transposes are HLO scatter-adds (~43 ms/step of
    the batch-32 flagship profile across the embedding's edge ops). A
    *per-graph batched* one-hot contraction ``[B,E,N] x [B,N,F]`` is only
    ~20 GFLOP at those shapes — sub-ms on the MXU — and its transpose is
    again a matmul, so the whole gather/scatter/softmax family stays on the
    MXU with no scatters anywhere. (The round-1 one-hot engine was slow
    because it was GLOBAL ``[B*E, B*N]``: 12x the FLOPs and a ~650 MB
    one-hot; batching per graph removes both.) But the one-hot FLOPs grow
    O(E*N) — linear in node count per op — while the table engine is
    ~O(E + N*K): past a crossover node count the "free" MXU FLOPs stop
    being free (SURVEY §5.7's scaling axis). Crossover evidence (round 5,
    DESIGN.md "Edge-engine microbench corrected"): the standalone
    microbench (tools/bench_edge_engines.py) proved unrepresentative —
    identical 22-GFLOP one-hot contractions cost 46.7 ms standalone vs
    0.73 ms/site inside the jitted step — so the decision experiment is
    END-TO-END: `SINGA_TPU_EDGE_TABLE=1 bench.py 32` vs default, recorded
    in that DESIGN section. The default threshold keeps one-hot for every
    shipped bucket; the table engine is reachable via env.

    Env overrides (A/B + forcing): ``SINGA_TPU_EDGE_TABLE=1`` forces the
    table engine everywhere; ``SINGA_TPU_EDGE_ONEHOT=1`` forces one-hot;
    ``SINGA_TPU_ONEHOT_MAX_N=<int>`` moves the crossover.
    """
    import os

    if os.environ.get("SINGA_TPU_EDGE_TABLE"):
        return False
    if os.environ.get("SINGA_TPU_EDGE_ONEHOT"):
        return True
    if n is None:
        return True
    return n <= int(os.environ.get("SINGA_TPU_ONEHOT_MAX_N", "4096"))


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
    # per-graph-local views for the one-hot matmul engine
    src_local: Optional[jax.Array] = None  # [B, E] int32 graph-local source
    dst_local: Optional[jax.Array] = None  # [B, E] int32 graph-local dest
    mask2: Optional[jax.Array] = None  # [B, E] bool

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
        return cls(
            src, dst, mask.reshape(-1), tbl.reshape(B * n_dst, -1), stbl,
            src_local=index[..., 0].astype(jnp.int32),
            dst_local=index[..., 1].astype(jnp.int32),
            mask2=mask,
        )

    @property
    def num_edges(self) -> int:
        return self.src_flat.shape[0]

    @property
    def num_dst(self) -> int:
        return self.edge_of.shape[0]

    def _mask_like(self, x: jax.Array) -> jax.Array:
        return self.mask.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)

    def _onehot(self, local: jax.Array, n: int, dtype) -> jax.Array:
        """[B, E, n] one-hot incidence with the edge mask folded in (masked
        edges are all-zero rows). Bool compare -> cast: carries no tangent,
        so autodiff never touches it."""
        oh = local[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (*local.shape, n), 2
        )
        return jnp.logical_and(oh, self.mask2[:, :, None]).astype(dtype)

    def _oh_gather(self, x2: jax.Array, local: jax.Array, n: int) -> jax.Array:
        """Per-graph one-hot gather: [B*n, F] rows -> [B*E, F] edge rows.

        Exactly one nonzero per output row; at HIGHEST precision the f32
        operand is decomposed (not rounded to bf16), so the contraction
        matches jnp.take to f32 rounding (bf16 inputs are exact either way);
        the transpose is the mirrored matmul."""
        B, E = local.shape
        xb = x2.reshape(B, n, -1)
        out = jnp.einsum(
            "ben,bnf->bef",
            self._onehot(local, n, x2.dtype),
            xb,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(B * E, -1)

    def gather_src(self, x: jax.Array) -> jax.Array:
        """x [B*N_src, ...] -> per-edge source rows [B*E, ...] (masked zero).

        Operates on a FLAT 2-D view (C=16..32-lane [N, I, C] rows pay ~4x
        (8,128)-tile bloat; [N, I*C] keeps lanes full)."""
        orig = x.shape[1:]
        x2 = x.reshape(x.shape[0], -1)
        if self.src_local is not None:
            n = x2.shape[0] // self.src_local.shape[0]
            if _use_onehot(n):
                return self._oh_gather(x2, self.src_local, n).reshape((-1,) + orig)
        if self.src_of is not None:
            out = _take_rows(x2, self.src_flat, self.src_of)
        else:
            out = jnp.take(x2, self.src_flat, axis=0)
        out = out * self.mask[:, None].astype(out.dtype)
        return out.reshape((-1,) + orig)

    def gather_dst(self, x: jax.Array) -> jax.Array:
        orig = x.shape[1:]
        x2 = x.reshape(x.shape[0], -1)
        if self.dst_local is not None:
            n = x2.shape[0] // self.dst_local.shape[0]
            if _use_onehot(n):
                return self._oh_gather(x2, self.dst_local, n).reshape((-1,) + orig)
        out = _take_rows(x2, self.dst_flat, self.edge_of)
        out = out * self.mask[:, None].astype(out.dtype)
        return out.reshape((-1,) + orig)

    def scatter_dst(self, m: jax.Array) -> jax.Array:
        """Sum per-edge values into destinations: [B*E, ...] -> [B*N_dst, ...].

        Accumulates in float32 regardless of input dtype. One-hot form: the
        transposed incidence contraction [B,N,E] x [B,E,F] (a matmul, f32
        accumulation on the MXU); its backward is the gather matmul."""
        orig = m.shape[1:]
        m2 = m.reshape(m.shape[0], -1)
        if self.dst_local is not None and _use_onehot(self.edge_of.shape[0] // self.dst_local.shape[0]):
            B, E = self.dst_local.shape
            n_dst = self.edge_of.shape[0] // B
            vb = m2.reshape(B, E, -1)
            out = jnp.einsum(
                "ben,bef->bnf",
                self._onehot(self.dst_local, n_dst, m2.dtype),
                vb,
                preferred_element_type=jnp.promote_types(m2.dtype, jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(m2.dtype)
            return out.reshape((-1,) + orig)
        v = m2 * self.mask[:, None].astype(m2.dtype)
        out = _scatter_rows(v, self.dst_flat, self.edge_of)
        return out.reshape((-1,) + orig)

    def softmax_dst(self, logits: jax.Array, eps: float = 1e-16) -> jax.Array:
        """Per-destination softmax over incoming edges; logits [B*E, H].

        Exactly stabilised with the per-destination max via the destination
        table. The max path is wrapped in stop_gradient — softmax is
        invariant to the subtracted constant, so its gradient is EXACTLY
        zero analytically — which kills the table gather's scatter-add
        transpose (14 ms/step in the round-3 batch-32 profile). The
        denominator rides the one-hot scatter/gather matmuls."""
        lg = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
        lp = jnp.concatenate([lg, jnp.full((1,) + lg.shape[1:], -jnp.inf, lg.dtype)])
        g = jnp.take(jax.lax.stop_gradient(lp), self.edge_of.reshape(-1), axis=0)
        g = g.reshape(self.num_dst, -1, *lg.shape[1:])  # [N, K, H]
        mx = jnp.max(g, axis=1)
        mx_safe = jnp.where(jnp.isfinite(mx), mx, 0.0)
        if self.dst_local is not None and _use_onehot(self.edge_of.shape[0] // self.dst_local.shape[0]):
            B, E = self.dst_local.shape
            n_dst = self.edge_of.shape[0] // B
            mx_e = jnp.take(mx_safe, self.dst_flat, axis=0)  # no-grad path
            e = jnp.exp(lg - mx_e) * self._mask_like(lg)
            oh = self._onehot(self.dst_local, n_dst, e.dtype)
            hp = jax.lax.Precision.HIGHEST
            dn = jnp.einsum("ben,beh->bnh", oh, e.reshape(B, E, -1), precision=hp)
            dn_e = jnp.einsum("ben,bnh->beh", oh, dn, precision=hp).reshape(B * E, -1)
            alpha = e / jnp.maximum(dn_e, eps)
            return alpha.astype(logits.dtype)
        # Table branch: the denominator must stay LIVE (its -alpha_i*alpha_j
        # gradient term is real); only the subtracted max is a gradient-free
        # constant. Building dn from the stop_gradient'd table gather silently
        # killed that term (advisor round-3 high finding).
        mx_e = jax.lax.stop_gradient(
            _take_rows(mx_safe, self.dst_flat, self.edge_of)
        )
        e = jnp.exp(lg - mx_e) * self._mask_like(lg)
        dn = _scatter_rows(e, self.dst_flat, self.edge_of)  # live, f32
        dn_e = _take_rows(dn, self.dst_flat, self.edge_of)
        alpha = e / jnp.maximum(dn_e, eps)
        return alpha.astype(logits.dtype)
