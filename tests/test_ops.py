import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singa_tpu.ops import (
    GaussianSmearing,
    knn_graph,
    knn_neighbors,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from singa_tpu.ops.laplacian import laplacian_edges, laplacian_pe_numpy
from singa_tpu.ops.knn import EdgeList


def test_segment_sum_masked():
    data = jnp.arange(6, dtype=jnp.float32).reshape(6, 1)
    ids = jnp.array([0, 0, 1, 1, 2, 2])
    mask = jnp.array([True, True, True, False, False, False])
    out = segment_sum(data, ids, 3, mask=mask)
    np.testing.assert_allclose(out[:, 0], [1.0, 2.0, 0.0])


def test_segment_mean_masked():
    data = jnp.array([[2.0], [4.0], [10.0]])
    ids = jnp.array([0, 0, 1])
    mask = jnp.array([True, True, False])
    out = segment_mean(data, ids, 2, mask=mask)
    np.testing.assert_allclose(out[:, 0], [3.0, 0.0])


def test_segment_softmax_sums_to_one():
    logits = jnp.array([1.0, 2.0, 3.0, -1.0, 100.0, 100.0])
    ids = jnp.array([0, 0, 0, 1, 1, 2])
    mask = jnp.array([True, True, True, True, True, False])
    p = segment_softmax(logits, ids, 3, mask=mask)
    sums = segment_sum(p, ids, 3, mask=mask)
    np.testing.assert_allclose(sums, [1.0, 1.0, 0.0], atol=1e-6)
    # all-masked segment contributes zeros, not NaNs
    assert not np.any(np.isnan(np.asarray(p)))


def test_segment_softmax_matches_dense():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=12).astype(np.float32))
    ids = jnp.asarray(np.repeat([0, 1, 2], 4))
    p = np.asarray(segment_softmax(logits, ids, 3))
    for s in range(3):
        seg = np.asarray(logits[ids == s])
        ref = np.exp(seg - seg.max())
        ref /= ref.sum()
        np.testing.assert_allclose(p[np.asarray(ids) == s], ref, rtol=1e-5)


def test_knn_neighbors_simple_line():
    # 4 points on a line; 2-NN of point 0 are points 1 and 2.
    pos = jnp.array([[[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [9.0, 0, 0]]])
    mask = jnp.ones((1, 4), dtype=bool)
    idx, valid = knn_neighbors(pos, mask, 2)
    assert valid.all()
    assert set(np.asarray(idx[0, 0]).tolist()) == {1, 2}
    assert set(np.asarray(idx[0, 3]).tolist()) == {2, 1}


def test_knn_respects_mask():
    pos = jnp.array([[[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [0.1, 0, 0]]])
    mask = jnp.array([[True, True, True, False]])
    idx, valid = knn_neighbors(pos, mask, 2)
    assert 3 not in np.asarray(idx[0, 0]).tolist()
    # masked query rows are fully invalid
    assert not bool(valid[0, 3].any())


def test_knn_graph_undirected_closure():
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
    mask = jnp.ones((2, 10), dtype=bool)
    e = knn_graph(pos, mask, 3, undirected=True)
    src = np.asarray(e.src)[np.asarray(e.mask)]
    dst = np.asarray(e.dst)[np.asarray(e.mask)]
    pairs = set(zip(src.tolist(), dst.tolist()))
    # symmetric
    assert all((b, a) in pairs for (a, b) in pairs)
    # no duplicates in the masked set
    assert len(pairs) == len(src)


def test_laplacian_edges_row_sums_zero():
    # For L = D - W, each row of the dense matrix sums to 0.
    src = jnp.array([0, 1, 1, 2])
    dst = jnp.array([1, 0, 2, 1])
    mask = jnp.ones(4, dtype=bool)
    w = jnp.ones((4, 2))
    edges, weight = laplacian_edges(EdgeList(src, dst, mask), w, 3)
    dense = np.zeros((3, 3, 2))
    for s, d, wt, m in zip(
        np.asarray(edges.src), np.asarray(edges.dst), np.asarray(weight), np.asarray(edges.mask)
    ):
        if m:
            dense[s, d] += wt
    np.testing.assert_allclose(dense.sum(axis=1), 0.0, atol=1e-6)


def test_laplacian_pe_orthogonal():
    # path graph 0-1-2-3-4
    ei = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
    pe = laplacian_pe_numpy(ei, 5, k=3)
    assert pe.shape == (5, 3)
    gram = pe.T @ pe
    np.testing.assert_allclose(gram, np.diag(np.diag(gram)), atol=1e-5)


def test_gaussian_smearing_shape_and_peak():
    sm = GaussianSmearing(start=0.0, stop=10.0, num_gaussians=11)
    out = sm(jnp.array([5.0]))
    assert out.shape == (1, 11)
    assert int(jnp.argmax(out[0])) == 5
    np.testing.assert_allclose(out[0, 5], 1.0, atol=1e-6)


def test_prefetcher_roundtrip_and_error_propagation():
    from singa_tpu.data.pipeline import Prefetcher

    out = list(Prefetcher(range(10), depth=3))
    assert out == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("source died")

    pf = Prefetcher(boom(), depth=2)
    items = []
    with pytest.raises(RuntimeError):
        for x in pf:
            items.append(x)
    assert items == [1]
