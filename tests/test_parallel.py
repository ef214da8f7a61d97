import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from singa_tpu.config import ParallelConfig
from singa_tpu.data.batch import synthetic_batch
from singa_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    replicate,
    shard_batch,
)

from tests.test_model import TGT_LEN, tiny_config


def test_make_mesh_shapes():
    mesh = make_mesh(ParallelConfig(num_data=4, num_model=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh1 = make_mesh(ParallelConfig())  # all devices on data
    assert mesh1.shape["data"] == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh(ParallelConfig(num_data=64, num_model=2))


def test_shard_batch_divisible_and_fallback():
    cfg = tiny_config()
    mesh = make_mesh(ParallelConfig(num_data=4, num_model=2))
    b8 = synthetic_batch(0, 8, shapes=cfg.shapes, tgt_len=TGT_LEN)
    sb = shard_batch(b8, mesh)
    spec = sb.protein.x.sharding.spec
    assert spec[0] == "data"
    # non-divisible batch falls back to replication
    b3 = synthetic_batch(0, 3, shapes=cfg.shapes, tgt_len=TGT_LEN)
    sb3 = shard_batch(b3, mesh)
    assert sb3.protein.x.sharding.is_fully_replicated


def test_param_sharding_rules():
    from singa_tpu.models.singa import SINGA

    cfg = tiny_config()
    batch = synthetic_batch(0, 2, shapes=cfg.shapes, tgt_len=TGT_LEN)
    model = SINGA(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(ParallelConfig(num_data=4, num_model=2))
    shardings = param_sharding(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    tp = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, s in flat
        if s.spec != P()
    ]
    # decoder FFN kernels and the vocab projection must be TP-sharded
    assert any("projection" in name for name in tp), tp[:5]
    assert any("conv1" in name for name in tp)


def test_data_parallel_grad_matches_single_device():
    """psum-free spec: jit over the mesh must give the same loss/grads as a
    single-device run (deterministic model, same batch)."""
    import optax

    from singa_tpu.models.singa import SINGA, cross_entropy_loss

    cfg = tiny_config()
    batch = synthetic_batch(0, 8, shapes=cfg.shapes, tgt_len=TGT_LEN)
    model = SINGA(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def loss_fn(p, b):
        return cross_entropy_loss(model.apply(p, b), b.tokens.target)

    g_single = jax.jit(jax.grad(loss_fn))(params, batch)

    mesh = make_mesh(ParallelConfig(num_data=8, num_model=1))
    p_sh = jax.device_put(params, param_sharding(params, mesh))
    b_sh = shard_batch(batch, mesh)
    with mesh:
        g_mesh = jax.jit(jax.grad(loss_fn))(p_sh, b_sh)

    n1 = float(optax.global_norm(g_single))
    n2 = float(optax.global_norm(g_mesh))
    np.testing.assert_allclose(n1, n2, rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(g_single)[0]
    l2 = jax.tree_util.tree_leaves(g_mesh)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_shard_batch_multihost_single_process_equals_shard_batch():
    """With one process, the per-host input path must produce arrays with
    the SAME sharding and values as shard_batch (SURVEY 2.9 DP input row)."""
    from singa_tpu.parallel.mesh import shard_batch_multihost

    mesh = make_mesh(ParallelConfig(num_data=4, num_model=2))
    cfg = tiny_config()
    batch = synthetic_batch(0, batch_size=8, shapes=cfg.shapes, tgt_len=TGT_LEN)
    a = shard_batch(batch, mesh)
    b = shard_batch_multihost(batch, mesh)
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        assert x.sharding.is_equivalent_to(y.sharding, x.ndim), (x.sharding, y.sharding)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_shard_batch_multihost_replicates_indivisible():
    from singa_tpu.parallel.mesh import shard_batch_multihost

    mesh = make_mesh(ParallelConfig(num_data=4, num_model=2))
    tree = {"a": jnp.ones((6, 3)), "s": jnp.ones(())}  # 6 % 4 != 0
    out = shard_batch_multihost(tree, mesh)
    assert out["a"].sharding.is_fully_replicated
    assert out["s"].sharding.is_fully_replicated
