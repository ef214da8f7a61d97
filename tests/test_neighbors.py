"""Destination-table edge engine: correctness vs brute force and vs the
round-1 one-hot engine (singa_tpu/ops/edge_matmul.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.ops.edge_matmul import MatmulEdges
from singa_tpu.ops.neighbors import EdgeEngine, build_dst_table


def _random_edges(seed, B, E, N, k_bound):
    rng = np.random.default_rng(seed)
    idx = np.zeros((B, E, 2), np.int32)
    mask = np.zeros((B, E), bool)
    for b in range(B):
        ne = rng.integers(E // 2, E + 1)
        pool = np.tile(np.arange(N), k_bound)
        rng.shuffle(pool)
        idx[b, :ne, 1] = pool[:ne]
        idx[b, :ne, 0] = rng.integers(0, N, ne)
        mask[b, :ne] = True
    return idx, mask


def test_build_dst_table_bruteforce():
    B, E, N, K = 3, 40, 10, 6
    idx, mask = _random_edges(0, B, E, N, K)
    tbl, kept, dropped = build_dst_table(idx[..., 1], mask, N, K)
    assert dropped == 0
    assert (kept == mask).all()
    for b in range(B):
        listed = sorted(int(e) for e in tbl[b].ravel() if e < E)
        expect = sorted(np.nonzero(mask[b])[0].tolist())
        assert listed == expect
        for n in range(N):
            for e in tbl[b, n]:
                if e < E:
                    assert idx[b, e, 1] == n and mask[b, e]


def test_build_dst_table_overflow_drops():
    B, E, N = 1, 12, 2
    idx = np.zeros((B, E, 2), np.int32)  # all edges -> dst 0
    mask = np.ones((B, E), bool)
    tbl, kept, dropped = build_dst_table(idx[..., 1], mask, N, 4)
    assert dropped == 8 and kept.sum() == 4
    assert (tbl[0, 0] < E).all() and (tbl[0, 1] == E).all()


def _engines(seed, B=3, E=24, N=8, K=5):
    idx, mask = _random_edges(seed, B, E, N, K)
    tbl, kept, dropped = build_dst_table(idx[..., 1], mask, N, K)
    assert dropped == 0
    # src table (sized generously: random sources can repeat up to E times)
    stbl, kept2, dropped2 = build_dst_table(idx[..., 0], mask, N, E)
    assert dropped2 == 0 and (kept2 == mask).all()
    new = EdgeEngine.create(
        jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(tbl), N, N,
        src_table=jnp.asarray(stbl),
    )
    old = MatmulEdges.create(jnp.asarray(idx), jnp.asarray(mask), N, N)
    return old, new, B, E, N


def test_table_vjps_match_xla_transpose():
    """gather/scatter custom VJPs (table transpose) == plain take/segment_sum
    autodiff."""
    _, new, B, E, N = _engines(7)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(B * N, 5, 3)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(B * E, 5, 3)).astype(np.float32))
    mask = new.mask.astype(x.dtype)[:, None, None]

    def plain_gather_src(v):
        return jnp.take(v, new.src_flat, axis=0) * mask

    def plain_gather_dst(v):
        return jnp.take(v, new.dst_flat, axis=0) * mask

    def plain_scatter(v):
        return jax.ops.segment_sum(v * mask, new.dst_flat, num_segments=B * N)

    for fn, ref, arg in [
        (new.gather_src, plain_gather_src, x),
        (new.gather_dst, plain_gather_dst, x),
        (new.scatter_dst, plain_scatter, m),
    ]:
        out, ref_out = fn(arg), ref(arg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-6)
        ct = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
        g = jax.grad(lambda v: jnp.vdot(fn(v), ct))(arg)
        g_ref = jax.grad(lambda v: jnp.vdot(ref(v), ct))(arg)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_engine_parity_gather_scatter():
    old, new, B, E, N = _engines(1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B * N, 7, 3)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(B * E, 7, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(new.gather_src(x)), np.asarray(old.gather_src(x)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new.gather_dst(x)), np.asarray(old.gather_dst(x)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new.scatter_dst(m)), np.asarray(old.scatter_dst(m)), atol=1e-5
    )


def test_engine_softmax_per_destination():
    old, new, B, E, N = _engines(3)
    rng = np.random.default_rng(4)
    lg = jnp.asarray(rng.normal(size=(B * E, 2)).astype(np.float32))
    alpha = np.asarray(new.softmax_dst(lg))
    # brute-force per destination
    dst = np.asarray(new.dst_flat)
    msk = np.asarray(new.mask)
    ref = np.zeros_like(alpha)
    for d in np.unique(dst[msk]):
        rows = (dst == d) & msk
        z = np.asarray(lg)[rows]
        z = z - z.max(0)
        ref[rows] = np.exp(z) / np.exp(z).sum(0)
    np.testing.assert_allclose(alpha, ref, atol=1e-6)
    # padded edges exactly zero
    assert (alpha[~msk] == 0).all()
    # and the one-hot engine agrees (same math, looser stabilisation)
    np.testing.assert_allclose(alpha, np.asarray(old.softmax_dst(lg)), atol=1e-4)


def test_table_branch_softmax_grad(monkeypatch):
    """SINGA_TPU_EDGE_TABLE=1 softmax must keep the denominator's gradient
    (the -alpha_i*alpha_j term) — regression for the advisor's round-3 high
    finding where stop_gradient on the table gather also froze dn."""
    monkeypatch.setenv("SINGA_TPU_EDGE_TABLE", "1")
    _, new, B, E, N = _engines(11)
    rng = np.random.default_rng(12)
    lg = jnp.asarray(rng.normal(size=(B * E, 2)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=lg.shape).astype(np.float32))

    dst = np.asarray(new.dst_flat)
    msk = np.asarray(new.mask)

    def brute(v):
        # per-destination softmax in pure jnp (autodiff reference)
        out = jnp.zeros_like(v)
        for d in np.unique(dst[msk]):
            rows = np.nonzero((dst == d) & msk)[0]
            z = v[rows]
            a = jax.nn.softmax(z, axis=0)
            out = out.at[rows].set(a)
        return out

    g_tab = jax.grad(lambda v: jnp.vdot(new.softmax_dst(v), ct))(lg)
    g_ref = jax.grad(lambda v: jnp.vdot(brute(v), ct))(lg)
    np.testing.assert_allclose(np.asarray(g_tab), np.asarray(g_ref), atol=1e-5)
    # and the default one-hot branch agrees too
    monkeypatch.delenv("SINGA_TPU_EDGE_TABLE")
    g_oh = jax.grad(lambda v: jnp.vdot(new.softmax_dst(v), ct))(lg)
    np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_ref), atol=1e-5)


def test_onehot_gather_exact_at_default_precision():
    """One-hot gathers must match jnp.take for f32 payloads WITHOUT the
    conftest 'highest' precision pin (advisor round-3: default-precision
    einsums rounded f32 positions to bf16, err ~7.6e-3)."""
    _, new, B, E, N = _engines(9)
    rng = np.random.default_rng(10)
    # values with structure below bf16 resolution
    x = jnp.asarray((rng.normal(size=(B * N, 3)) * (1 + 1e-5)).astype(np.float32))
    with jax.default_matmul_precision("default"):
        got = np.asarray(new.gather_src(x))
        ref = np.asarray(
            jnp.take(x, new.src_flat, axis=0) * new.mask[:, None].astype(x.dtype)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_engine_grads_flow():
    old, new, B, E, N = _engines(5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(B * N, 4)).astype(np.float32))

    def loss(engine, x):
        g = engine.gather_src(x)
        a = engine.softmax_dst(g[:, :2])
        return jnp.sum(engine.scatter_dst(g * jnp.pad(a, ((0, 0), (0, 2)), constant_values=1.0)) ** 2)

    g_new = jax.grad(lambda v: loss(new, v))(x)
    g_old = jax.grad(lambda v: loss(old, v))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old), atol=1e-4)
