"""Cross-chip edge-list sharding (parallel/edge_shard.py): partial segment
reductions + psum must reproduce the single-device segment ops exactly for
one oversized graph sharded over the 8-device CPU mesh (SURVEY §5.7)."""
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.config import ParallelConfig
from singa_tpu.ops.segment import segment_sum
from singa_tpu.parallel.edge_shard import (
    shard_edge_list,
    sharded_attention_pass,
    sharded_edge_softmax,
    sharded_gather_src,
    sharded_segment_sum,
)
from singa_tpu.parallel.mesh import make_mesh

N, E, F, H = 96, 1000, 16, 4  # E deliberately NOT divisible by 8


def _graph(seed=0):
    rng = np.random.default_rng(seed)
    ei = rng.integers(0, N, size=(E, 2)).astype(np.int32)
    msg = rng.normal(size=(E, F)).astype(np.float32)
    scores = rng.normal(size=(E, H)).astype(np.float32)
    mask = rng.random(E) > 0.1
    return jnp.asarray(ei), jnp.asarray(msg), jnp.asarray(scores), jnp.asarray(mask)


def _mesh():
    return make_mesh(ParallelConfig(num_data=8, num_model=1))


def test_sharded_segment_sum_matches_single_device():
    ei, msg, _, mask = _graph()
    mesh = _mesh()
    s_ei, s_msg, s_mask = shard_edge_list(ei, msg, mask, mesh)
    out = sharded_segment_sum(s_msg, s_ei[:, 1], s_mask, N, mesh)
    ref = segment_sum(jnp.where(mask[:, None], msg, 0.0), ei[:, 1], N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert out.sharding.is_fully_replicated


def test_sharded_edge_softmax_matches_single_device():
    ei, _, scores, mask = _graph(1)
    mesh = _mesh()
    s_ei, s_scores, s_mask = shard_edge_list(ei, scores, mask, mesh)
    out = sharded_edge_softmax(s_scores, s_ei[:, 1], s_mask, N, mesh)
    # single-device reference: per-dst stable softmax
    neg = jnp.asarray(-1e30, scores.dtype)
    s_live = jnp.where(mask[:, None], scores, neg)
    mx = jax.ops.segment_max(s_live, ei[:, 1], num_segments=N)
    e = jnp.exp(s_live - mx[ei[:, 1]]) * mask[:, None]
    den = segment_sum(e, ei[:, 1], N)
    ref = e / jnp.maximum(den[ei[:, 1]], 1e-16)
    np.testing.assert_allclose(
        np.asarray(out)[: E], np.asarray(ref), atol=1e-5
    )
    # per-destination weights sum to 1 where the dst has live edges
    tot = segment_sum(jnp.asarray(out)[:E], ei[:, 1], N)
    live_dst = np.unique(np.asarray(ei[:, 1])[np.asarray(mask)])
    np.testing.assert_allclose(np.asarray(tot)[live_dst], 1.0, atol=1e-4)


def test_sharded_gather_is_local():
    ei, msg, _, mask = _graph(2)
    mesh = _mesh()
    nodes = jnp.asarray(np.random.default_rng(3).normal(size=(N, F)).astype(np.float32))
    s_ei, _, s_mask = shard_edge_list(ei, msg, mask, mesh)
    out = sharded_gather_src(nodes, s_ei[:, 0], mesh)
    ref = jnp.take(nodes, ei[:, 0], axis=0)
    np.testing.assert_allclose(np.asarray(out)[:E], np.asarray(ref), atol=0)


def test_sharded_attention_pass_end_to_end():
    ei, msg, scores, mask = _graph(4)
    mesh = _mesh()
    nodes = jnp.zeros((N, F), jnp.float32)
    s_ei, (s_msg, s_scores), s_mask = shard_edge_list(
        ei, (msg, scores), mask, mesh
    )
    out = sharded_attention_pass(nodes, s_ei, s_scores, s_msg, s_mask, N, mesh)
    assert out.shape == (N, F)
    assert bool(jnp.isfinite(out).all())
    # reference on one device
    neg = jnp.asarray(-1e30, scores.dtype)
    s_live = jnp.where(mask[:, None], scores, neg)
    mx = jax.ops.segment_max(s_live, ei[:, 1], num_segments=N)
    e = jnp.exp(s_live - mx[ei[:, 1]]) * mask[:, None]
    den = segment_sum(e, ei[:, 1], N)
    alpha = e / jnp.maximum(den[ei[:, 1]], 1e-16)
    weighted = msg * alpha.mean(axis=-1, keepdims=True)
    ref = segment_sum(jnp.where(mask[:, None], weighted, 0.0), ei[:, 1], N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
