import jax
import jax.numpy as jnp
import numpy as np
import pytest

from singa_tpu.equivariant import so3
from singa_tpu.equivariant.grid import get_grid
from singa_tpu.equivariant.layers import (
    EquivariantRMSNorm,
    SO2Conv,
    SO3Linear,
    s2_activation,
)
from singa_tpu.equivariant.sh import rot_z
from singa_tpu.equivariant.wigner import wigner_blocks

LMAX, MMAX = 6, 2


@pytest.fixture(autouse=True)
def _exact_matmuls():
    """fp32 equivariance at the BASELINE <=1e-5 bar requires exact (non-TF32
    -style) matmuls; 'highest' is what the fp32 reference effectively uses."""
    with jax.default_matmul_precision("highest"):
        yield


def _rand_rot(seed):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def _rotate_full(R, x):
    return so3.rotate_full(jnp.asarray(R[None], x.dtype), x, LMAX)


def test_grid_roundtrip_identity_full_m():
    grid = get_grid(LMAX, LMAX)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, (LMAX + 1) ** 2, 3)).astype(np.float32))
    y = grid.from_grid(grid.to_grid(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_grid_roundtrip_rescale_truncated():
    # for l > mmax the roundtrip amplifies by (2l+1)/(2mmax+1), by design
    grid = get_grid(LMAX, MMAX)
    mapping = so3.CoefficientMapping(LMAX, MMAX)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, mapping.n_trunc, 2)).astype(np.float32))
    y = np.asarray(grid.from_grid(grid.to_grid(x)))
    expected_scale = np.where(
        mapping.l_of_trunc > MMAX,
        (2.0 * mapping.l_of_trunc + 1) / (2 * MMAX + 1),
        1.0,
    )
    np.testing.assert_allclose(
        y, np.asarray(x) * expected_scale[None, :, None], atol=1e-4
    )


def test_so3_linear_equivariance():
    key = jax.random.PRNGKey(0)
    mod = SO3Linear(features=5, lmax=LMAX)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(6, (LMAX + 1) ** 2, 3)).astype(np.float32))
    params = mod.init(key, x)
    R = _rand_rot(3)
    out1 = _rotate_full(R, mod.apply(params, x))
    out2 = mod.apply(params, _rotate_full(R, x))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_rms_norm_equivariance():
    key = jax.random.PRNGKey(0)
    mod = EquivariantRMSNorm(lmax=LMAX)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(6, (LMAX + 1) ** 2, 3)).astype(np.float32))
    params = mod.init(key, x)
    R = _rand_rot(5)
    out1 = _rotate_full(R, mod.apply(params, x))
    out2 = mod.apply(params, _rotate_full(R, x))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def _z_gauge_rotate_trunc(psi, x):
    """Apply Dz(psi) to truncated l-primary features."""
    blocks = wigner_blocks(jnp.asarray(rot_z(psi)[None], x.dtype), LMAX, LMAX)
    mapping = so3.CoefficientMapping(LMAX, MMAX)
    outs = []
    off = 0
    for l in range(LMAX + 1):
        mm = min(l, MMAX)
        D = blocks[l][0]  # [2l+1, 2l+1]
        Dk = D[l - mm : l + mm + 1, l - mm : l + mm + 1]
        xl = x[:, off : off + 2 * mm + 1, :]
        outs.append(jnp.einsum("kn,enc->ekc", Dk, xl))
        off += 2 * mm + 1
    return jnp.concatenate(outs, axis=1)


def test_so2_conv_gauge_equivariance():
    """SO2 conv must commute with rotations about the edge axis (z)."""
    key = jax.random.PRNGKey(0)
    mapping = so3.CoefficientMapping(LMAX, MMAX)
    mod = SO2Conv(features=4, lmax=LMAX, mmax=MMAX)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(8, mapping.n_trunc, 3)).astype(np.float32))
    params = mod.init(key, x)
    psi = 0.9
    out1 = _z_gauge_rotate_trunc(psi, mod.apply(params, x))
    out2 = mod.apply(params, _z_gauge_rotate_trunc(psi, x))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_so2_conv_extra_m0_invariance():
    key = jax.random.PRNGKey(1)
    mapping = so3.CoefficientMapping(LMAX, MMAX)
    mod = SO2Conv(features=4, lmax=LMAX, mmax=MMAX, extra_m0_features=5)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(8, mapping.n_trunc, 3)).astype(np.float32))
    params = mod.init(key, x)
    _, extra1 = mod.apply(params, x)
    _, extra2 = mod.apply(params, _z_gauge_rotate_trunc(1.3, x))
    np.testing.assert_allclose(np.asarray(extra1), np.asarray(extra2), atol=1e-5)


def test_s2_activation_z_equivariance_full_m():
    """S2 activation equivariance: exact in the linear regime, approximate
    through the nonlinearity.

    SiLU on a band-limited sphere signal creates frequencies above the grid's
    band limit, which alias gauge-dependently — measured ~0.13 relative at
    unit-scale inputs, identical in the reference (same grid resolutions,
    EF_layers.py:551-556); this is an inherent property of the architecture,
    not an implementation artifact. What must be exact is the transform pair
    itself: a *linear* pointwise map commutes with z-rotations to fp32
    precision.
    """
    from singa_tpu.equivariant.grid import get_grid

    rng = np.random.default_rng(8)
    x = jnp.asarray(
        0.05 * rng.normal(size=(4, (LMAX + 1) ** 2, 2)).astype(np.float32)
    )
    psi = 0.7
    blocks = wigner_blocks(jnp.asarray(rot_z(psi)[None], jnp.float32), LMAX, LMAX)

    def rot(v):
        outs = []
        for l in range(LMAX + 1):
            s = l * l
            outs.append(jnp.einsum("kn,enc->ekc", blocks[l][0], v[:, s : s + 2 * l + 1]))
        return jnp.concatenate(outs, axis=1)

    # 1) linear grid round trip commutes exactly
    grid = get_grid(LMAX, LMAX)
    lin = lambda v: grid.from_grid(grid.to_grid(v) * 0.5)
    out1 = np.asarray(rot(lin(x)))
    out2 = np.asarray(lin(rot(x)))
    err_lin = np.abs(out1 - out2).max() / (np.abs(out1).max() + 1e-9)
    assert err_lin < 1e-5, err_lin

    # 2) the nonlinearity's gauge aliasing stays within the known envelope
    act = lambda v: s2_activation(v, LMAX, LMAX)
    out1 = np.asarray(rot(act(x)))
    out2 = np.asarray(act(rot(x)))
    err = np.abs(out1 - out2).max() / (np.abs(out1).max() + 1e-9)
    assert err < 0.3, err


def test_ffn_gate_exact_equivariance():
    """The gate-FFN variant has no grid transforms: gates are invariant
    (l=0-derived) scalars multiplying whole degrees, so it is EXACTLY
    equivariant under arbitrary rotations (unlike the S2 variants' aliasing
    envelope)."""
    from singa_tpu.equivariant.attention import FeedForwardNetwork

    mod = FeedForwardNetwork(
        hidden_channels=12, output_channels=5, lmax=LMAX, activation="gate"
    )
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(6, (LMAX + 1) ** 2, 3)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(2), x)
    R = _rand_rot(22)
    out1 = _rotate_full(R, mod.apply(params, x))
    out2 = mod.apply(params, _rotate_full(R, x))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_ffn_grid_variant_z_equivariance_envelope():
    """The grid-MLP FFN variant commutes with rotations up to the S2 grid's
    aliasing envelope (same property as the plain S2 activation)."""
    from singa_tpu.equivariant.attention import FeedForwardNetwork

    mod = FeedForwardNetwork(
        hidden_channels=8, output_channels=4, lmax=LMAX, activation="grid"
    )
    rng = np.random.default_rng(23)
    x = jnp.asarray(
        0.05 * rng.normal(size=(4, (LMAX + 1) ** 2, 3)).astype(np.float32)
    )
    params = mod.init(jax.random.PRNGKey(3), x)
    psi = 0.7
    blocks = wigner_blocks(jnp.asarray(rot_z(psi)[None], jnp.float32), LMAX, LMAX)

    def rot(v):
        outs = []
        for l in range(LMAX + 1):
            s = l * l
            outs.append(
                jnp.einsum("kn,enc->ekc", blocks[l][0], v[:, s : s + 2 * l + 1])
            )
        return jnp.concatenate(outs, axis=1)

    out1 = np.asarray(rot(mod.apply(params, x)))
    out2 = np.asarray(mod.apply(params, rot(x)))
    err = np.abs(out1 - out2).max() / (np.abs(out1).max() + 1e-9)
    assert err < 0.3, err


def test_pallas_s2_kernel_parity():
    """Fused Pallas S2 activation (interpret mode) matches the XLA path,
    forward and backward."""
    from singa_tpu.equivariant.grid import get_grid
    from singa_tpu.ops.pallas.s2_act import s2_silu

    grid = get_grid(LMAX, LMAX)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, 49, 24)).astype(np.float32))

    def ref(v):
        return grid.from_grid(jax.nn.silu(grid.to_grid(v)))

    got = s2_silu(x, grid.to_grid_mat, grid.from_grid_mat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x)), atol=1e-5)

    g1 = jax.grad(lambda v: (ref(v) ** 2).sum())(x)
    g2 = jax.grad(
        lambda v: (s2_silu(v, grid.to_grid_mat, grid.from_grid_mat) ** 2).sum()
    )(x)
    # atol 2e-4 (vs the 1e-5 fp32 bar): the kernel's backward re-derives
    # d(silu) from a RECOMPUTED grid tensor while jax.grad of the reference
    # differentiates the saved one — the extra matmul round-off accumulates
    # over the G~200-point grid contraction and cannot reach 1e-5.
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-4, rtol=1e-4)


def test_pallas_s2_sep_kernel_parity():
    """Fused separable S2 kernel (interpret mode) == gate + S2 + concat XLA
    path, forward and backward (both inputs)."""
    from singa_tpu.equivariant.grid import get_grid
    from singa_tpu.ops.pallas.s2_act import s2_silu_sep

    grid = get_grid(LMAX, LMAX)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(8, 49, 24)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(8, 24)).astype(np.float32))

    def ref(v, sc):
        out0 = jax.nn.silu(sc)[:, None, :]
        out = grid.from_grid(jax.nn.silu(grid.to_grid(v)))
        return jnp.concatenate([out0, out[:, 1:, :]], axis=1)

    got = s2_silu_sep(x, s, grid.to_grid_mat, grid.from_grid_mat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, s)), atol=1e-5)

    def loss(fn):
        return lambda v, sc: (fn(v, sc) * jnp.cos(jnp.arange(24.0))).sum()

    g1 = jax.grad(loss(ref), argnums=(0, 1))(x, s)
    g2 = jax.grad(
        loss(lambda v, sc: s2_silu_sep(v, sc, grid.to_grid_mat, grid.from_grid_mat)),
        argnums=(0, 1),
    )(x, s)
    for a, b in zip(g2, g1):
        # atol 2e-4: same recompute-vs-saved grid round-off as the plain S2
        # kernel above; the fp32 math itself is identical.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)


def test_pallas_so3_ffn_fused_parity():
    """Fused SO3-FFN mega-kernel (interpret mode) == the XLA reference path
    of FeedForwardNetwork: forward and gradients for input + every param."""
    from singa_tpu.equivariant.layers import _grid_mats_for, add_l0
    from singa_tpu.ops.pallas.so3_ffn import so3_ffn_fused

    lmax, C, H, Co, N = 3, 4, 256, 4, 40
    L = lmax + 1
    I = (lmax + 1) ** 2
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(N, I, C)).astype(np.float32))
    w1 = jnp.asarray(0.2 * rng.normal(size=(L, C, H)).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.normal(size=(H,)).astype(np.float32))
    wg = jnp.asarray(0.2 * rng.normal(size=(C, H)).astype(np.float32))
    bg = jnp.asarray(0.1 * rng.normal(size=(H,)).astype(np.float32))
    w2 = jnp.asarray(0.1 * rng.normal(size=(L, H, Co)).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.normal(size=(Co,)).astype(np.float32))
    tg, fg = _grid_mats_for(lmax, lmax, False)
    tg = jnp.asarray(tg.reshape(-1, I))
    fg = jnp.asarray(fg.reshape(-1, I))

    l_of = np.asarray([l for l in range(L) for _ in range(2 * l + 1)])

    def ref(x, w1, b1, wg, bg, w2, b2):
        gating = x[:, 0, :] @ wg + bg
        w1e = jnp.take(jnp.swapaxes(w1, 1, 2), l_of, axis=0)  # [I, H, C]
        h = add_l0(jnp.einsum("nic,ioc->nio", x, w1e), b1)
        grid = jnp.einsum("gi,nic->ngc", tg, h)
        mid = jnp.einsum("gi,ngc->nic", fg, jax.nn.silu(grid))
        mid = jnp.concatenate(
            [jax.nn.silu(gating)[:, None, :], mid[:, 1:, :]], axis=1
        )
        w2e = jnp.take(w2, l_of, axis=0)  # [I, H, Co]
        return add_l0(jnp.einsum("nio,ioc->nic", mid, w2e), b2)

    from singa_tpu.ops.pallas.so3_ffn import pad_grid_mat

    tgp = jnp.asarray(pad_grid_mat(np.asarray(tg), lmax))
    fgp = jnp.asarray(pad_grid_mat(np.asarray(fg), lmax))

    def fused(x, w1, b1, wg, bg, w2, b2):
        return so3_ffn_fused(x, w1, b1, wg, bg, w2, b2, tgp, fgp, lmax, True)

    args = (x, w1, b1, wg, bg, w2, b2)
    y_ref = ref(*args)
    y = fused(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-5, rtol=1e-5)

    ct = jnp.asarray(rng.normal(size=y_ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda *a: jnp.vdot(ref(*a), ct), argnums=tuple(range(7)))(*args)
    g = jax.grad(lambda *a: jnp.vdot(fused(*a), ct), argnums=tuple(range(7)))(*args)
    names = ["x", "w1", "b1", "wg", "bg", "w2", "b2"]
    for name, a, b in zip(names, g, g_ref):
        # atol 5e-4: weight grads sum over all N=40 nodes through the fused
        # H=256 grid chain (recomputed, not saved — see s2 kernel note), so
        # round-off grows with the reduction length; per-element relative
        # error stays at the 1e-4 level.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4, err_msg=name
        )


def test_pallas_so3_gate_ffn_fused_parity():
    """Fused gate-FFN kernel (interpret mode) == the XLA gate path of
    FeedForwardNetwork: forward and gradients for input + every param."""
    from singa_tpu.equivariant.layers import add_l0, gate_activation
    from singa_tpu.ops.pallas.so3_ffn import so3_gate_ffn_fused

    lmax, C, H, Co, N = 3, 4, 256, 4, 40
    L = lmax + 1
    I = (lmax + 1) ** 2
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.normal(size=(N, I, C)).astype(np.float32))
    w1 = jnp.asarray(0.2 * rng.normal(size=(L, C, H)).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.normal(size=(H,)).astype(np.float32))
    wg = jnp.asarray(0.2 * rng.normal(size=(C, lmax * H)).astype(np.float32))
    bg = jnp.asarray(0.1 * rng.normal(size=(lmax * H,)).astype(np.float32))
    w2 = jnp.asarray(0.1 * rng.normal(size=(L, H, Co)).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.normal(size=(Co,)).astype(np.float32))

    l_of = np.asarray([l for l in range(L) for _ in range(2 * l + 1)])

    def ref(x, w1, b1, wg, bg, w2, b2):
        gating = x[:, 0, :] @ wg + bg
        w1e = jnp.take(jnp.swapaxes(w1, 1, 2), l_of, axis=0)  # [I, H, C]
        h = add_l0(jnp.einsum("nic,ioc->nio", x, w1e), b1)
        h = gate_activation(gating, h, lmax, lmax)
        w2e = jnp.take(w2, l_of, axis=0)  # [I, H, Co]
        return add_l0(jnp.einsum("nio,ioc->nic", h, w2e), b2)

    def fused(x, w1, b1, wg, bg, w2, b2):
        return so3_gate_ffn_fused(x, w1, b1, wg, bg, w2, b2, lmax, True)

    args = (x, w1, b1, wg, bg, w2, b2)
    y_ref = ref(*args)
    y = fused(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=3e-5, rtol=1e-5)

    ct = jnp.asarray(rng.normal(size=y_ref.shape).astype(np.float32))
    g_ref = jax.grad(lambda *a: jnp.vdot(ref(*a), ct), argnums=tuple(range(7)))(*args)
    g = jax.grad(lambda *a: jnp.vdot(fused(*a), ct), argnums=tuple(range(7)))(*args)
    names = ["x", "w1", "b1", "wg", "bg", "w2", "b2"]
    for name, a, b in zip(names, g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4, err_msg=name
        )


def test_pallas_so2_attn_fused_parity():
    """Fused rotate+SO2conv+sepS2+SO2conv kernel (interpret mode) == the
    composed XLA chain: forward, and gradients for every differentiable
    input (edge features, radial modulation, all conv weights/biases)."""
    from singa_tpu.equivariant.layers import separable_s2_activation
    from singa_tpu.ops.pallas.so2_attn import _grids, so2_attn_fused

    lmax, mmax = LMAX, MMAX
    mapping = so3.CoefficientMapping(lmax, mmax)
    n_trunc = mapping.n_trunc
    n0 = mapping.m_size[0]
    secs = [n0] + [2 * s for s in mapping.m_size[1:]]
    c_in, H, F2, alpha_ch = 8, 128, 8, 6
    extra_ch = alpha_ch + H
    E = 10
    rng = np.random.default_rng(23)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    x = r(E, (lmax + 1) ** 2, c_in)
    rad = r(E, n_trunc, c_in) + 1.0
    phi = jnp.asarray(rng.uniform(-np.pi, np.pi, E).astype(np.float32))
    beta = jnp.asarray(rng.uniform(0, np.pi, E).astype(np.float32))
    w1s = [r(rows * c_in, rows * H + (extra_ch if i == 0 else 0))
           for i, rows in enumerate(secs)]
    b1 = r(n0 * H + extra_ch)
    w2s = [r(rows * H, rows * F2) for rows in secs]
    b2 = r(n0 * F2)
    tgj, fgj = (jnp.asarray(g) for g in _grids(lmax, mmax))

    def ref(x, rad, w1s, b1, w2s, b2):
        mp = so3.rotate(
            so3.EdgeFrame(phi=phi, beta=beta), x, lmax, mmax, m_primary=True
        )
        flat = (mp * rad).reshape(E, n_trunc * c_in)
        off = 0
        ys = []
        for i, rows in enumerate(secs):
            y = flat[:, off : off + rows * c_in] @ w1s[i]
            if i == 0:
                y = y + b1
            ys.append(y)
            off += rows * c_in
        extra = ys[0][:, n0 * H :]
        h = jnp.concatenate(
            [ys[0][:, : n0 * H].reshape(E, n0, H)]
            + [y.reshape(E, rows, H) for y, rows in zip(ys[1:], secs[1:])],
            axis=1,
        )
        gating = extra[:, alpha_ch:]
        mid = separable_s2_activation(gating, h, lmax, mmax, m_primary=True)
        mid_flat = mid.reshape(E, n_trunc * H)
        zs = []
        off = 0
        for i, rows in enumerate(secs):
            z = mid_flat[:, off : off + rows * H] @ w2s[i]
            if i == 0:
                z = z + b2
            zs.append(z)
            off += rows * H
        return tuple(zs) + (extra,)

    def fused(x, rad, w1s, b1, w2s, b2):
        return so2_attn_fused(
            x, rad, phi, beta, w1s, b1, w2s, b2, tgj, fgj,
            lmax, mmax, H, F2, alpha_ch, True,
        )

    args = (x, rad, w1s, b1, w2s, b2)
    out_ref = ref(*args)
    out = fused(*args)
    for i, (a, b) in enumerate(zip(out, out_ref)):
        # rtol 2e-4: the kernel folds the z-rotation flips into the J
        # matmuls (diag(sin).FLIP == -FLIP.diag(sin)), so the fp32 sums are
        # reassociated relative to the elementwise z-combine reference;
        # outputs reach O(20) through two conv contractions.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=2e-4,
            err_msg=f"output {i}",
        )

    cts = [jnp.asarray(rng.normal(size=o.shape).astype(np.float32)) for o in out_ref]

    def loss(fn):
        def f(*a):
            return sum(jnp.vdot(o, c) for o, c in zip(fn(*a), cts))

        return f

    g_ref = jax.grad(loss(ref), argnums=tuple(range(6)))(*args)
    g = jax.grad(loss(fused), argnums=tuple(range(6)))(*args)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat = jax.tree_util.tree_leaves(g)
    assert len(flat) == len(flat_ref)
    for i, (a, b) in enumerate(zip(flat, flat_ref)):
        # 1e-4: grads accumulate over the E-edge reduction through the
        # recomputed grid chain (cf. the FFN kernel tolerance note above)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=f"grad {i}",
        )


def test_graph_attention_fused_path_matches_xla(monkeypatch):
    """Full GraphAttention module: the fused-kernel routing (fused_parts
    weight assembly -> so2_attn_fused -> section reassembly) produces the
    same output and input-gradient as the composed XLA path, under ONE
    shared parameter dict (checkpoint compatibility across the switch)."""
    from singa_tpu.equivariant.attention import GraphAttention
    from singa_tpu.ops.neighbors import EdgeEngine

    lmax, mmax = LMAX, MMAX
    B, N, E, K = 1, 6, 12, 4
    C, De = 8, 8
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(N, (lmax + 1) ** 2, C)).astype(np.float32) * 0.3)
    x_edge = jnp.asarray(rng.normal(size=(E, De)).astype(np.float32))
    src = rng.integers(0, N, E).astype(np.int32)
    dst = np.repeat(np.arange(N), E // N)[:E].astype(np.int32)
    index = jnp.asarray(np.stack([src, dst], -1)[None])
    mask = jnp.ones((B, E), bool)
    table = np.full((B, N, K), E, np.int32)
    fill = np.zeros(N, np.int32)
    for e, d in enumerate(dst):
        table[0, d, fill[d]] = e
        fill[d] += 1
    edges = EdgeEngine.create(index, mask, jnp.asarray(table), N, N)
    vec = rng.normal(size=(E, 3)).astype(np.float32)
    frame = so3.edge_frame(jnp.asarray(vec))

    mod = GraphAttention(
        sphere_channels=C,
        hidden_channels=128,
        num_heads=2,
        attn_alpha_channels=3,
        attn_value_channels=4,
        output_channels=C,
        lmax=lmax,
        mmax=mmax,
        edge_channels=(16, 16),
    )
    params = mod.init(jax.random.PRNGKey(0), x, x, x_edge, edges, frame)

    def run(x):
        return mod.apply(params, x, x, x_edge, edges, frame)

    monkeypatch.delenv("SINGA_TPU_FORCE_FUSED_SO2", raising=False)
    out_ref, grad_ref = jax.value_and_grad(lambda x: jnp.sum(run(x) ** 2))(x)
    monkeypatch.setenv("SINGA_TPU_FORCE_FUSED_SO2", "1")
    out_fused, grad_fused = jax.value_and_grad(lambda x: jnp.sum(run(x) ** 2))(x)
    # 2e-4: fp32 reassociation between the folded-matmul rotate inside the
    # kernel and the elementwise z-combine of the XLA path (see the kernel
    # parity test above), squared through the loss.
    np.testing.assert_allclose(out_fused, out_ref, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(grad_fused), np.asarray(grad_ref), atol=2e-4, rtol=2e-4
    )
