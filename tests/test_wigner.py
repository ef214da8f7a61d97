import jax.numpy as jnp
import numpy as np

from singa_tpu.equivariant import so3
from singa_tpu.equivariant.sh import fit_wigner_d, real_sph_harm
from singa_tpu.equivariant.wigner import edge_rotation, wigner_blocks

LMAX = 6


def _random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    rots = []
    for _ in range(n):
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        rots.append(Q)
    return np.stack(rots)


def test_wigner_blocks_match_numpy_fit():
    rots = _random_rotations(3, seed=1)
    blocks = wigner_blocks(jnp.asarray(rots, jnp.float32), LMAX, LMAX)
    for i in range(rots.shape[0]):
        ref = fit_wigner_d(LMAX, rots[i], seed=5 + i)
        for l in range(LMAX + 1):
            got = np.asarray(blocks[l][i])
            np.testing.assert_allclose(got, ref[l], atol=2e-5)


def test_wigner_orthogonal():
    rots = _random_rotations(2, seed=2)
    blocks = wigner_blocks(jnp.asarray(rots, jnp.float32), LMAX, LMAX)
    for l in range(LMAX + 1):
        D = np.asarray(blocks[l])
        eye = np.eye(2 * l + 1)
        for i in range(D.shape[0]):
            np.testing.assert_allclose(D[i] @ D[i].T, eye, atol=1e-5)


def test_sh_transforms_covariantly():
    # Y(Rx) == D(R) Y(x) with jax-computed blocks and numpy SH
    rots = _random_rotations(1, seed=3)
    R = rots[0]
    rng = np.random.default_rng(4)
    x = rng.normal(size=(20, 3))
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    Y = real_sph_harm(LMAX, x)
    Yr = real_sph_harm(LMAX, x @ R.T)
    blocks = wigner_blocks(jnp.asarray(R[None], jnp.float32), LMAX, LMAX)
    for l in range(LMAX + 1):
        s, e = l * l, (l + 1) ** 2
        got = Y[:, s:e] @ np.asarray(blocks[l][0]).T
        np.testing.assert_allclose(got, Yr[:, s:e], atol=3e-5)


def test_edge_rotation_aligns_to_z():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(50, 3)).astype(np.float32)
    R = np.asarray(edge_rotation(jnp.asarray(v)))
    vhat = v / np.linalg.norm(v, axis=-1, keepdims=True)
    aligned = np.einsum("eij,ej->ei", R, vhat)
    np.testing.assert_allclose(aligned[:, 2], 1.0, atol=1e-5)
    np.testing.assert_allclose(aligned[:, :2], 0.0, atol=1e-5)
    det = np.linalg.det(R)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)
    # near-z and zero-length edges stay finite
    special = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, -2.0], [0.0, 0.0, 0.0]])
    Rs = np.asarray(edge_rotation(special))
    assert np.isfinite(Rs).all()


def test_rotate_roundtrip_full_m():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(7, (LMAX + 1) ** 2, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
    blocks = so3.edge_wigner(v, LMAX, LMAX)
    y = so3.rotate(blocks, x, LMAX, LMAX)
    x2 = so3.rotate_inv(blocks, y, LMAX, LMAX)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_m_primary_roundtrip_and_blocking():
    mapping = so3.CoefficientMapping(LMAX, 2)
    assert mapping.n_trunc == 29
    assert mapping.m_size == [7, 6, 5]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, 29, 2)).astype(np.float32))
    m = mapping.to_m_primary(x)
    back = mapping.to_l_primary(m)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
    # m=0 block of the m-primary layout equals the m0 gather
    np.testing.assert_allclose(
        np.asarray(m[:, :7]), np.asarray(jnp.take(x, mapping.m0_trunc, axis=-2))
    )


def test_so2_pair_structure_under_axis_rotation():
    """Rotating about the edge axis must mix only (m, -m) pairs by angle m*t."""
    import numpy as np
    from singa_tpu.equivariant.sh import rot_z

    t = 0.7
    blocks = wigner_blocks(jnp.asarray(rot_z(t)[None], jnp.float32), LMAX, LMAX)
    for l in range(1, LMAX + 1):
        D = np.asarray(blocks[l][0])
        for m in range(1, l + 1):
            i, j = l + m, l - m
            np.testing.assert_allclose(D[i, i], np.cos(m * t), atol=1e-5)
            np.testing.assert_allclose(D[i, j], -np.sin(m * t), atol=1e-5)
            np.testing.assert_allclose(D[j, i], np.sin(m * t), atol=1e-5)
        # no mixing outside the pair
        mask = np.ones_like(D, dtype=bool)
        for m in range(0, l + 1):
            mask[l + m, l + m] = mask[l - m, l - m] = False
            mask[l + m, l - m] = mask[l - m, l + m] = False
        np.testing.assert_allclose(D[mask], 0.0, atol=1e-5)
