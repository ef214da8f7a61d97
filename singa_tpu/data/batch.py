"""The fixed-shape batch contract between host featurization and the device.

Replaces PyG HeteroData batching (/root/reference/utils/Featuriser.py:119-160,
model/GAN.py:48-55). Every field is a dense padded array with an explicit
mask; the whole structure is a pytree that crosses the jit/shard_map boundary
unchanged. See DESIGN.md for the table of shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.config import EOS_TOKEN, PAD_TOKEN, SOS_TOKEN, ShapeConfig
from singa_tpu.ops.knn import EdgeList


class NodeSet(NamedTuple):
    x: jax.Array  # [B, N, F] float32 node features
    pos: jax.Array  # [B, N, 3] float32
    atomic_num: jax.Array  # [B, N] int32
    mask: jax.Array  # [B, N] bool
    lap_pe: jax.Array  # [B, N, K] float32 Laplacian PE (precomputed)


class EdgeSet(NamedTuple):
    index: jax.Array  # [B, E, 2] int32 graph-local (src, dst)
    attr: jax.Array  # [B, E, A] float32
    mask: jax.Array  # [B, E] bool


class PropertySet(NamedTuple):
    sas: jax.Array  # [B]
    logp: jax.Array
    qed: jax.Array
    weight: jax.Array
    tpsa: jax.Array
    vina: jax.Array


class TokenSet(NamedTuple):
    input: jax.Array  # [B, T] int32, '&' + tokens + '^' padding
    target: jax.Array  # [B, T] int32, tokens + '$' + '^' padding


class BatchTables(NamedTuple):
    """Host-precomputed destination tables for the two merged embedding
    stages (see singa_tpu/ops/neighbors.py). Node index space is the merged
    [protein(0..Np); ligand(Np..Np+Nl)] set; edge positions index the merged
    lists [pp; ll] (intra) and [lp; pl] (inter), sentinel = list length."""

    intra: jax.Array  # [B, Np+Nl, K_intra] int32
    inter: jax.Array  # [B, Np+Nl, K_inter] int32
    # source-side tables (same layout): the transpose of a source gather is a
    # sum over the source's outgoing edges; with these tables that transpose
    # is a gather+reduce instead of an HLO scatter-add (ops/neighbors.py)
    intra_src: jax.Array | None = None
    inter_src: jax.Array | None = None


class ComplexBatch(NamedTuple):
    protein: NodeSet
    ligand: NodeSet
    pp: EdgeSet  # protein  -> protein  (covalent)
    ll: EdgeSet  # ligand   -> ligand   (covalent)
    lp: EdgeSet  # ligand   -> protein  (interactions)
    pl: EdgeSet  # protein  -> ligand   (interactions)
    props: PropertySet
    tokens: TokenSet
    tables: BatchTables | None = None  # attach_tables() fills this

    @property
    def batch_size(self) -> int:
        return self.protein.x.shape[0]


def attach_tables(
    batch: ComplexBatch,
    k_intra: int | None = None,
    k_inter: int | None = None,
    shapes: ShapeConfig | None = None,
) -> ComplexBatch:
    """Compute the merged destination tables on the host and attach them.

    Edges beyond the per-destination cap are dropped (masks updated in the
    returned batch) so the tables and edge masks stay consistent; real
    chemistry stays far under the caps (bond degree <= 6; interaction caps
    sized from the edge buckets).
    """
    from singa_tpu.ops.neighbors import build_dst_table

    shapes = shapes or ShapeConfig()
    k_intra = k_intra or shapes.max_in_degree_intra
    k_inter = k_inter or shapes.max_in_degree_inter

    n_p = batch.protein.x.shape[1]
    n_l = batch.ligand.x.shape[1]
    n_c = n_p + n_l
    pp_i = np.asarray(batch.pp.index)
    ll_i = np.asarray(batch.ll.index)
    lp_i = np.asarray(batch.lp.index)
    pl_i = np.asarray(batch.pl.index)

    # merged layouts must mirror EquivariantEmbedding.__call__
    intra_dst = np.concatenate([pp_i[..., 1], ll_i[..., 1] + n_p], axis=1)
    intra_src = np.concatenate([pp_i[..., 0], ll_i[..., 0] + n_p], axis=1)
    intra_mask = np.concatenate(
        [np.asarray(batch.pp.mask), np.asarray(batch.ll.mask)], axis=1
    )
    inter_dst = np.concatenate([lp_i[..., 1], pl_i[..., 1] + n_p], axis=1)
    inter_src = np.concatenate([lp_i[..., 0] + n_p, pl_i[..., 0]], axis=1)
    inter_mask = np.concatenate(
        [np.asarray(batch.lp.mask), np.asarray(batch.pl.mask)], axis=1
    )

    def _both_tables(dst, src, mask, k):
        """dst + src tables over the same kept mask: drops from either side
        shrink the mask, then both tables are rebuilt so no table references a
        dropped edge (a kept-but-untabulated edge would silently lose its
        forward contribution or its gradient)."""
        _, kept, _ = build_dst_table(dst, mask, n_c, k)
        _, kept, _ = build_dst_table(src, kept, n_c, k)
        dst_tbl, kept2, d1 = build_dst_table(dst, kept, n_c, k)
        src_tbl, kept3, d2 = build_dst_table(src, kept2, n_c, k)
        assert d1 == 0 and d2 == 0 and (kept3 == kept).all()
        return dst_tbl, src_tbl, kept

    intra_tbl, intra_src_tbl, intra_kept = _both_tables(
        intra_dst, intra_src, intra_mask, k_intra
    )
    inter_tbl, inter_src_tbl, inter_kept = _both_tables(
        inter_dst, inter_src, inter_mask, k_inter
    )

    e_pp = pp_i.shape[1]
    e_lp = lp_i.shape[1]
    pp = batch.pp._replace(mask=jnp.asarray(intra_kept[:, :e_pp]))
    ll = batch.ll._replace(mask=jnp.asarray(intra_kept[:, e_pp:]))
    lp = batch.lp._replace(mask=jnp.asarray(inter_kept[:, :e_lp]))
    pl = batch.pl._replace(mask=jnp.asarray(inter_kept[:, e_lp:]))
    return batch._replace(
        pp=pp,
        ll=ll,
        lp=lp,
        pl=pl,
        tables=BatchTables(
            intra=jnp.asarray(intra_tbl),
            inter=jnp.asarray(inter_tbl),
            intra_src=jnp.asarray(intra_src_tbl),
            inter_src=jnp.asarray(inter_src_tbl),
        ),
    )


def flat_edges(edge_set: EdgeSet, num_src: int, num_dst: int) -> EdgeList:
    """Convert graph-local [B, E, 2] edges into a flat global EdgeList."""
    B = edge_set.index.shape[0]
    base_src = (jnp.arange(B, dtype=jnp.int32) * num_src)[:, None]
    base_dst = (jnp.arange(B, dtype=jnp.int32) * num_dst)[:, None]
    src = (edge_set.index[..., 0] + base_src).reshape(-1)
    dst = (edge_set.index[..., 1] + base_dst).reshape(-1)
    return EdgeList(src, dst, edge_set.mask.reshape(-1))


def flat_nodes(node_set: NodeSet) -> NodeSet:
    """Flatten [B, N, ...] node arrays to [B*N, ...]."""
    return NodeSet(
        x=node_set.x.reshape(-1, node_set.x.shape[-1]),
        pos=node_set.pos.reshape(-1, 3),
        atomic_num=node_set.atomic_num.reshape(-1),
        mask=node_set.mask.reshape(-1),
        lap_pe=node_set.lap_pe.reshape(-1, node_set.lap_pe.shape[-1]),
    )


def synthetic_batch(
    seed: int,
    batch_size: int,
    shapes: ShapeConfig = ShapeConfig(),
    tgt_len: int = 200,
    vocab_size: int = 116,
    smiles_tokens: bool = False,
) -> ComplexBatch:
    """Generate a geometrically plausible random batch (tests & benchmarks).

    Node counts vary per graph; positions are packed points; covalent edges
    chain consecutive atoms plus shortcuts, so degree statistics resemble the
    real featurizer output.
    """
    rng = np.random.default_rng(seed)
    s = shapes

    def nodes(nmax, lo, hi):
        counts = rng.integers(lo, hi + 1, size=batch_size)
        mask = np.arange(nmax)[None, :] < counts[:, None]
        pos = rng.normal(size=(batch_size, nmax, 3)).astype(np.float32) * 4.0
        x = np.zeros((batch_size, nmax, s.node_feat_dim), dtype=np.float32)
        elem = rng.choice([1, 6, 7, 8, 16], size=(batch_size, nmax))
        onehot_idx = rng.integers(0, 44, size=(batch_size, nmax))
        for b in range(batch_size):
            x[b, np.arange(nmax), onehot_idx[b]] = 1.0
        x[:, :, 44:] = rng.integers(0, 2, size=(batch_size, nmax, s.node_feat_dim - 44))
        x *= mask[..., None]
        lap = (rng.normal(size=(batch_size, nmax, s.lap_dim)) * mask[..., None]).astype(
            np.float32
        )
        return (
            x,
            pos.astype(np.float32),
            (elem * mask).astype(np.int32),
            mask,
            lap,
            counts,
        )

    def edges(emax, counts, attr_dim, counts_dst=None, max_in_degree=6):
        """Random edges with bounded in-degree (like covalent/contact graphs)."""
        idx = np.zeros((batch_size, emax, 2), dtype=np.int32)
        attr = rng.normal(size=(batch_size, emax, attr_dim)).astype(np.float32)
        mask = np.zeros((batch_size, emax), dtype=bool)
        for b in range(batch_size):
            n_src = counts[b]
            n_dst = counts_dst[b] if counts_dst is not None else n_src
            ne = min(emax, int(1.8 * min(n_src, n_dst)))
            # destinations drawn with bounded multiplicity
            pool = np.tile(np.arange(n_dst), max_in_degree)
            rng.shuffle(pool)
            dst = pool[:ne]
            src = rng.integers(0, n_src, size=ne)
            if counts_dst is None:  # avoid zero-length self-loop vectors
                src = np.where(src == dst, (src + 1) % n_src, src)
            idx[b, :ne, 0] = src
            idx[b, :ne, 1] = dst
            mask[b, :ne] = True
        attr *= mask[..., None]
        return idx, attr, mask

    px, ppos, pel, pmask, plap, pcnt = nodes(s.num_protein_nodes, s.num_protein_nodes // 2, s.num_protein_nodes)
    lx, lpos, lel, lmask, llap, lcnt = nodes(s.num_ligand_nodes, max(6, s.num_ligand_nodes // 3), s.num_ligand_nodes)

    ppi, ppa, ppm = edges(s.num_pp_edges, pcnt, 6)
    lli, lla, llm = edges(s.num_ll_edges, lcnt, 6)
    lpi, lpa, lpm = edges(s.num_lp_edges, lcnt, 11, pcnt)
    pli, pla, plm = edges(s.num_pl_edges, pcnt, 11, lcnt)

    # tokens: '&' + body + '$'(in target) + '^' padding
    tok_in = np.full((batch_size, tgt_len), PAD_TOKEN, dtype=np.int32)
    tok_tgt = np.full((batch_size, tgt_len), PAD_TOKEN, dtype=np.int32)
    if smiles_tokens:
        # real drug SMILES (chem/drug_corpus.py) so the decoder has actual
        # grammar to learn — used by the %valid generation demonstration
        from singa_tpu.chem.drug_corpus import CORPUS
        from singa_tpu.chem.tokenizer import encode, split_smiles

        usable = [
            smi for _, smi in CORPUS if len(split_smiles(smi)) + 1 <= tgt_len
        ]
        picks = rng.integers(0, len(usable), size=batch_size)
        for b, p in enumerate(picks):
            tok_in[b], tok_tgt[b] = encode(usable[int(p)], tgt_len)
    else:
        for b in range(batch_size):
            n = int(rng.integers(10, min(60, tgt_len - 2)))
            body = rng.integers(3, vocab_size, size=n)
            tok_in[b, 0] = SOS_TOKEN
            tok_in[b, 1 : n + 1] = body
            tok_tgt[b, :n] = body
            tok_tgt[b, n] = EOS_TOKEN

    j = jnp.asarray
    batch = ComplexBatch(
        protein=NodeSet(j(px), j(ppos), j(pel), j(pmask), j(plap)),
        ligand=NodeSet(j(lx), j(lpos), j(lel), j(lmask), j(llap)),
        pp=EdgeSet(j(ppi), j(ppa), j(ppm)),
        ll=EdgeSet(j(lli), j(lla), j(llm)),
        lp=EdgeSet(j(lpi), j(lpa), j(lpm)),
        pl=EdgeSet(j(pli), j(pla), j(plm)),
        props=PropertySet(
            sas=j(rng.uniform(1, 8, batch_size).astype(np.float32)),
            logp=j(rng.uniform(-2, 6, batch_size).astype(np.float32)),
            qed=j(rng.uniform(0, 1, batch_size).astype(np.float32)),
            weight=j(rng.uniform(150, 600, batch_size).astype(np.float32)),
            tpsa=j(rng.uniform(10, 150, batch_size).astype(np.float32)),
            vina=j(rng.uniform(-12, -3, batch_size).astype(np.float32)),
        ),
        tokens=TokenSet(j(tok_in), j(tok_tgt)),
    )
    return attach_tables(batch, shapes=shapes)
