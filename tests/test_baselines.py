import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.equivariant.layers import EquivariantLayerNormSH, get_norm_layer
from singa_tpu.models.baselines import EGNN, GIN, GATLayer, check_rotation_equivariance
from singa_tpu.ops.knn import EdgeList
from singa_tpu.ops.smearing import linear_sigmoid_smearing, sigmoid_smearing


def _graph(n=10, seed=0):
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n), 3)
    dst = rng.integers(0, n, size=3 * n)
    dst = np.where(dst == src, (dst + 1) % n, dst)
    edges = EdgeList(jnp.asarray(src), jnp.asarray(dst), jnp.ones(3 * n, bool))
    z = jnp.asarray(rng.integers(1, 9, n))
    pos = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    gid = jnp.zeros(n, jnp.int32)
    return z, pos, edges, gid


def test_egnn_invariant_output():
    z, pos, edges, gid = _graph()
    model = EGNN(hidden=16, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), z, pos, edges, gid, 10, 1)
    rng = np.random.default_rng(1)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    ok = check_rotation_equivariance(
        lambda h, p: model.apply(params, z, p, edges, gid, 10, 1), None, pos, Q
    )
    assert ok


def test_gat_and_gin_run():
    z, pos, edges, gid = _graph()
    x = jax.nn.one_hot(z, 16)
    gat = GATLayer(features=8)
    gp = gat.init(jax.random.PRNGKey(0), x, edges, 10)
    out = gat.apply(gp, x, edges, 10)
    assert out.shape == (10, 8)

    gin = GIN(hidden=16, num_layers=2)
    params = gin.init(jax.random.PRNGKey(1), x, edges, gid, 10, 1)
    y = gin.apply(params, x, edges, gid, 10, 1)
    assert y.shape == (1, 1) and np.isfinite(np.asarray(y)).all()


def test_layer_norm_sh_equivariance():
    from singa_tpu.equivariant import so3

    lmax = 4
    mod = get_norm_layer("layer_norm_sh", lmax)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, (lmax + 1) ** 2, 3)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    R = jnp.asarray(Q[None], jnp.float32)
    out1 = so3.rotate_full(R, mod.apply(params, x), lmax)
    out2 = mod.apply(params, so3.rotate_full(R, x, lmax))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-5)


def test_extra_smearings():
    d = jnp.asarray([0.5, 2.0])
    s1 = sigmoid_smearing(d, 0, 5, 8)
    s2 = linear_sigmoid_smearing(d, 0, 5, 8)
    assert s1.shape == (2, 8) and s2.shape == (2, 8)
    assert np.isfinite(np.asarray(s1)).all() and np.isfinite(np.asarray(s2)).all()
