"""Parity: DenseGraphMHA must reproduce the flat segment-op GraphMHA exactly
(same kNN-closure + Laplacian graph, parameters copied across)."""
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.models.cpromg import GraphMHA, _build_graph
from singa_tpu.models.dense_graph import DenseGraphMHA, build_dense_graph

B, N, C, H = 2, 12, 16, 2
KD = 8  # key_channels=16 -> kd per head 8
K = 4
SMEAR_STOP = 15.0
EDGE_CH = 8


def _setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 3)
    mask = jnp.asarray(rng.random((B, N)) > 0.2)

    dense = DenseGraphMHA(
        hidden_channels=C, key_channels=16, num_heads=H,
        edge_channels=EDGE_CH, smear_stop=SMEAR_STOP,
    )
    flat = GraphMHA(hidden_channels=C, key_channels=16, num_heads=H)

    g = build_dense_graph(pos, mask, K, SMEAR_STOP, EDGE_CH)
    edges, edge_attr = _build_graph(pos, mask, K, SMEAR_STOP, EDGE_CH)

    dp = dense.init(jax.random.PRNGKey(1), x, g)
    x_flat = x.reshape(B * N, C)
    fp = flat.init(jax.random.PRNGKey(2), x_flat, edges, edge_attr)
    return x, pos, mask, dense, flat, g, edges, edge_attr, dp, fp


def _sync_params(dp, fp):
    """Copy flat-module params into the dense module's structure."""
    d = jax.tree_util.tree_map(lambda v: v, dp)  # copy
    dd = d["params"]
    ff = fp["params"]
    dd["q_lin"] = ff["q_lin"]["weight"]
    dd["k_lin"] = ff["k_lin"]["weight"]
    dd["v_lin"] = ff["v_lin"]["weight"]
    for name in ("weight_k_net", "weight_v_net", "centroid_lin", "out_transform"):
        dd[name] = ff[name]
    dd["weight_k_lin_kernel"] = ff["weight_k_lin"]["Dense_0"]["kernel"]
    dd["weight_v_lin"] = ff["weight_v_lin"]
    dd["layer_norm"] = ff["layer_norm"]
    return d


def test_dense_matches_flat():
    x, pos, mask, dense, flat, g, edges, edge_attr, dp, fp = _setup()
    dp = _sync_params(dp, fp)

    out_dense = dense.apply(dp, x, g)  # [B, N, C]
    out_flat = flat.apply(fp, x.reshape(B * N, C), edges, edge_attr)
    out_flat = out_flat.reshape(B, N, C) * np.asarray(mask)[..., None]

    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_flat), atol=2e-4, rtol=1e-3
    )


def test_dense_padding_invariance():
    x, pos, mask, dense, flat, g, edges, edge_attr, dp, fp = _setup()
    out1 = np.asarray(dense.apply(dp, x, g))
    # corrupt padded node features/positions
    noise = jnp.asarray((~np.asarray(mask))[..., None] * 9.0)
    g2 = build_dense_graph(pos + noise, mask, K, SMEAR_STOP, EDGE_CH)
    out2 = np.asarray(dense.apply(dp, x + noise * 0.3, g2))
    np.testing.assert_allclose(out1, out2, atol=1e-4)


def test_neighbor_form_matches_dense():
    """NeighborGraphMHA (gather form over [B, N, K] in-neighbor lists) ==
    DenseGraphMHA under one param dict, including padded nodes."""
    from singa_tpu.models.neighbor_graph import (
        NeighborGraphMHA,
        build_neighbor_graph,
    )

    x, pos, mask, dense, _, g, _, _, dp, _ = _setup()
    nb = NeighborGraphMHA(
        hidden_channels=C, key_channels=16, num_heads=H,
        edge_channels=EDGE_CH, smear_stop=SMEAR_STOP,
    )
    # K = N so no in-degree overflow: forms must agree exactly
    gn = build_neighbor_graph(pos, mask, K, SMEAR_STOP, EDGE_CH, k_in=N)
    # neighbour lists reproduce the dense adjacency
    adj_from_nb = np.zeros((B, N, N), bool)
    for b in range(B):
        for i in range(N):
            for kk in range(gn.nbr.shape[2]):
                if bool(gn.nbr_mask[b, i, kk]):
                    adj_from_nb[b, i, int(gn.nbr[b, i, kk])] = True
    np.testing.assert_array_equal(adj_from_nb, np.asarray(g.adj))
    np.testing.assert_allclose(
        np.asarray(gn.deg_attr), np.asarray(g.deg_attr), atol=1e-5
    )

    out_d = dense.apply(dp, x, g)
    out_n = nb.apply(dp, x, gn)
    np.testing.assert_allclose(
        np.asarray(out_n), np.asarray(out_d), atol=2e-5, rtol=1e-5
    )


def test_fused_neighbor_attn_matches_xla(monkeypatch):
    """The fused Pallas neighbor-attention kernel (interpret mode) matches
    the XLA path of NeighborGraphMHA, forward and gradients."""
    from singa_tpu.models.neighbor_graph import (
        NeighborGraphMHA,
        build_neighbor_graph,
    )

    x, pos, mask, _, _, _, _, _, dp, _ = _setup()
    nb = NeighborGraphMHA(
        hidden_channels=C, key_channels=16, num_heads=H,
        edge_channels=EDGE_CH, smear_stop=SMEAR_STOP,
    )
    gn = build_neighbor_graph(pos, mask, K, SMEAR_STOP, EDGE_CH)
    params = nb.init(jax.random.PRNGKey(5), x, gn)

    out_xla = nb.apply(params, x, gn)
    monkeypatch.setenv("SINGA_TPU_FORCE_FUSED_ATTN", "1")
    out_fused = nb.apply(params, x, gn)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), atol=5e-5, rtol=1e-4
    )

    ct = jnp.asarray(
        np.random.default_rng(9).normal(size=out_xla.shape).astype(np.float32)
    )

    def loss(p, fused):
        if fused:
            monkeypatch.setenv("SINGA_TPU_FORCE_FUSED_ATTN", "1")
        else:
            monkeypatch.delenv("SINGA_TPU_FORCE_FUSED_ATTN", raising=False)
        return jnp.vdot(nb.apply(p, x, gn), ct)

    monkeypatch.delenv("SINGA_TPU_FORCE_FUSED_ATTN", raising=False)
    g_xla = jax.grad(lambda p: loss(p, False))(params)
    g_fused = jax.grad(lambda p: loss(p, True))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for (path, a), b in zip(flat_x, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_hybrid_neighbor_attn_matches_xla(monkeypatch):
    """The HYBRID Pallas kernel (XLA row-gathers outside, pair math in VMEM)
    matches the XLA path of NeighborGraphMHA, forward and gradients."""
    from singa_tpu.models.neighbor_graph import (
        NeighborGraphMHA,
        build_neighbor_graph,
    )

    x, pos, mask, _, _, _, _, _, dp, _ = _setup()
    nb = NeighborGraphMHA(
        hidden_channels=C, key_channels=16, num_heads=H,
        edge_channels=EDGE_CH, smear_stop=SMEAR_STOP,
    )
    gn = build_neighbor_graph(pos, mask, K, SMEAR_STOP, EDGE_CH)
    params = nb.init(jax.random.PRNGKey(5), x, gn)

    out_xla = nb.apply(params, x, gn)
    monkeypatch.setenv("SINGA_TPU_FORCE_FUSED_ATTN", "1")
    monkeypatch.setenv("SINGA_TPU_HYBRID_ATTN", "1")
    out_hyb = nb.apply(params, x, gn)
    np.testing.assert_allclose(
        np.asarray(out_hyb), np.asarray(out_xla), atol=5e-5, rtol=1e-4
    )

    ct = jnp.asarray(
        np.random.default_rng(9).normal(size=out_xla.shape).astype(np.float32)
    )

    def loss(p, hybrid):
        if hybrid:
            monkeypatch.setenv("SINGA_TPU_FORCE_FUSED_ATTN", "1")
            monkeypatch.setenv("SINGA_TPU_HYBRID_ATTN", "1")
        else:
            monkeypatch.delenv("SINGA_TPU_FORCE_FUSED_ATTN", raising=False)
            monkeypatch.delenv("SINGA_TPU_HYBRID_ATTN", raising=False)
        return jnp.vdot(nb.apply(p, x, gn), ct)

    monkeypatch.delenv("SINGA_TPU_FORCE_FUSED_ATTN", raising=False)
    monkeypatch.delenv("SINGA_TPU_HYBRID_ATTN", raising=False)
    g_xla = jax.grad(lambda p: loss(p, False))(params)
    g_hyb = jax.grad(lambda p: loss(p, True))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
    flat_h = jax.tree_util.tree_leaves(g_hyb)
    for (path, a), b in zip(flat_x, flat_h):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )
