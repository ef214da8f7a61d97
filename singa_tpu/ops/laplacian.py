"""Graph-Laplacian edge transform and Laplacian positional encodings.

* ``laplacian_edges`` reproduces PyG ``get_laplacian`` with per-channel edge
  weights as used by the CProMG encoders (/root/reference/model/CProMG.py:298,334):
  off-diagonal entries become ``-w`` and ``N`` self-loop edges carry the degree.
* ``laplacian_pe_numpy`` is the ETL-time replacement for the per-forward
  ``dgl.lap_pe(g, 8)`` host eigendecomposition (CProMG.py:562-571) — computed
  once per graph offline, stored in the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.ops.knn import EdgeList
from singa_tpu.ops.segment import segment_sum


def laplacian_edges(
    edges: EdgeList,
    edge_weight: jax.Array,
    num_nodes: int,
) -> tuple[EdgeList, jax.Array]:
    """Unnormalised graph Laplacian L = D - W as an edge list.

    Args:
      edges: flat EdgeList over ``num_nodes`` global nodes.
      edge_weight: ``[E, C]`` per-edge weights (masked edges must already be 0-safe).
      num_nodes: total (padded) node count B*N.

    Returns ``(edges_out, weight_out)`` where edges_out has ``E + num_nodes``
    entries: the originals with ``-w`` followed by self-loops carrying the
    degree ``sum_j w_ij`` (aggregated at ``src``, matching PyG's row-degree).
    """
    deg = segment_sum(edge_weight, edges.src, num_nodes, mask=edges.mask)
    loop = jnp.arange(num_nodes, dtype=edges.src.dtype)
    src = jnp.concatenate([edges.src, loop])
    dst = jnp.concatenate([edges.dst, loop])
    mask = jnp.concatenate([edges.mask, jnp.ones((num_nodes,), dtype=bool)])
    weight = jnp.concatenate([-edge_weight, deg], axis=0)
    weight = jnp.where(mask[:, None], weight, jnp.zeros_like(weight))
    return EdgeList(src, dst, mask), weight


def laplacian_pe_numpy(
    edge_index: np.ndarray,
    num_nodes: int,
    k: int = 8,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """k smallest non-trivial eigenvectors of the symmetric-normalised Laplacian.

    Matches DGL ``lap_pe`` semantics: L = I - D^-1/2 A D^-1/2 on the undirected
    simple graph; eigenvectors of the k smallest non-zero eigenvalues, padded
    with zeros when the graph has fewer than k+1 nodes; random sign flip per
    eigenvector (sign is arbitrary).
    """
    if rng is None:
        rng = np.random.default_rng(0)
    A = np.zeros((num_nodes, num_nodes), dtype=np.float64)
    if edge_index.size:
        A[edge_index[0], edge_index[1]] = 1.0
        A[edge_index[1], edge_index[0]] = 1.0
    np.fill_diagonal(A, 0.0)
    deg = A.sum(axis=1)
    inv_sqrt = np.where(deg > 0, deg, 1.0) ** -0.5
    L = np.eye(num_nodes) - (inv_sqrt[:, None] * A * inv_sqrt[None, :])
    vals, vecs = np.linalg.eigh(L)
    order = np.argsort(vals)
    # Skip the trivial (near-zero) eigenvector, take the next k.
    take = order[1 : k + 1]
    pe = np.zeros((num_nodes, k), dtype=np.float32)
    got = vecs[:, take].astype(np.float32)
    sign = rng.choice([-1.0, 1.0], size=got.shape[1]).astype(np.float32)
    pe[:, : got.shape[1]] = got * sign
    return pe
