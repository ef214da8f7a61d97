"""Parity: the gather-free dense attention kernel (ops/pallas/dense_edge_attn)
must match the XLA neighbor path of NeighborGraphMHA — forward and gradients
— under one param dict (round-5 encoder redesign)."""
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.models.neighbor_graph import NeighborGraphMHA, build_neighbor_graph

B, N, C, H = 2, 12, 16, 2
K = 4
SMEAR_STOP = 15.0
EDGE_CH = 8


def _setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 3)
    mask = jnp.asarray(rng.random((B, N)) > 0.2)
    nb = NeighborGraphMHA(
        hidden_channels=C, key_channels=16, num_heads=H,
        edge_channels=EDGE_CH, smear_stop=SMEAR_STOP,
    )
    # k_in=N: no in-degree overflow, so list form == dense adjacency exactly
    gn = build_neighbor_graph(
        pos, mask, K, SMEAR_STOP, EDGE_CH, k_in=N, with_adj_dist=True
    )
    params = nb.init(jax.random.PRNGKey(5), x, gn)
    return x, mask, nb, gn, params


def test_adj_dist_consistent_with_lists():
    _, _, _, gn, _ = _setup()
    from singa_tpu.ops.pallas.dense_edge_attn import BIG

    ad = np.asarray(gn.adj_dist)
    # every (i, j) pair from the lists carries its real distance; everything
    # else (incl. the diagonal) carries BIG
    expect_adj = np.zeros((B, N, N), bool)
    for b in range(B):
        for i in range(N):
            for kk in range(gn.nbr.shape[2]):
                if bool(gn.nbr_mask[b, i, kk]):
                    j = int(gn.nbr[b, i, kk])
                    expect_adj[b, i, j] = True
                    np.testing.assert_allclose(
                        ad[b, i, j], float(gn.dist[b, i, kk]), atol=1e-5
                    )
    np.testing.assert_array_equal(ad < BIG / 2, expect_adj)
    assert (np.diagonal(ad, axis1=1, axis2=2) > BIG / 2).all()


def test_dense_kernel_matches_xla_forward(monkeypatch):
    x, _, nb, gn, params = _setup()
    out_xla = nb.apply(params, x, gn)
    monkeypatch.setenv("SINGA_TPU_FORCE_FUSED_ATTN", "1")
    monkeypatch.setenv("SINGA_TPU_DENSE_ATTN", "1")
    out_k = nb.apply(params, x, gn)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_xla), atol=5e-5, rtol=1e-4
    )


def test_dense_kernel_matches_xla_grads(monkeypatch):
    x, _, nb, gn, params = _setup()
    ct = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, N, C)).astype(np.float32)
    )

    def loss(p, xx, fused):
        if fused:
            monkeypatch.setenv("SINGA_TPU_FORCE_FUSED_ATTN", "1")
            monkeypatch.setenv("SINGA_TPU_DENSE_ATTN", "1")
        else:
            monkeypatch.delenv("SINGA_TPU_FORCE_FUSED_ATTN", raising=False)
            monkeypatch.delenv("SINGA_TPU_DENSE_ATTN", raising=False)
        return jnp.sum(nb.apply(p, xx, gn) * ct)

    g_ref = jax.grad(loss, argnums=(0, 1))(params, x, False)
    g_k = jax.grad(loss, argnums=(0, 1))(params, x, True)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_k = jax.tree_util.tree_leaves(g_k)
    assert len(flat_ref) == len(flat_k)
    for a, b in zip(flat_ref, flat_k):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3
        )


def test_dense_kernel_padding_invariance(monkeypatch):
    """Corrupting padded-node inputs must not change real-node outputs."""
    x, mask, nb, gn, params = _setup()
    monkeypatch.setenv("SINGA_TPU_FORCE_FUSED_ATTN", "1")
    monkeypatch.setenv("SINGA_TPU_DENSE_ATTN", "1")
    out1 = np.asarray(nb.apply(params, x, gn))
    noise = jnp.asarray((~np.asarray(mask))[..., None] * 7.0)
    out2 = np.asarray(nb.apply(params, x + noise, gn))
    np.testing.assert_allclose(out1, out2, atol=1e-4)
