"""Numerical anchoring against the PyTorch reference (torch-cpu is installed;
e3nn/PyG are not, so the pure-torch pieces are driven with import stubs).

What is anchored here (BASELINE.md: "per-layer fp32 match vs PyTorch
reference"):

1. **Wigner-D representation** — the reference borrows e3nn 0.4.0's
   ``Jd.pt`` + ``wigner_D`` (EF_layers.py:2195-2251). Our ``jd.npz`` is
   generated independently (tools/gen_jd.py, least-squares fits of our own
   real spherical harmonics — no e3nn data). Empirically the two bases
   COINCIDE: for rotations matched through the l=1 representation the per-l
   Wigner blocks agree to ~3e-15 in float64 with the identity coefficient
   map. The only convention difference is 3-vector bookkeeping: e3nn's l=1
   component order is (y, z, x).
2. **Coefficient bookkeeping** — the reference CoefficientMappingModule
   (EF_layers.py:1413-1552) instantiated directly; its ``to_m`` permutation,
   m-block sizes, coefficient masks and the m-truncation rescale must match
   our static index arrays (singa_tpu/equivariant/so3.py).

3. **Composed equivariant blocks** (round 4): the full
   SO2EquivariantGraphAttention (EF_layers.py:878-1204) and TransBlockV2
   (1207-1410, homogeneous AND hetero dict-x paths) are golden-anchored
   END-TO-END at fp64/1e-10. The reference draws a RANDOM azimuthal gauge
   per forward (init_edge_rot_mat, EF_layers.py:2302 ``torch.rand_like``);
   determinism comes from seeding torch and injecting the reference's own
   per-edge Wigner D-matrices into our ``so3.rotate`` explicit path — with
   identical rotation constants on both sides the gauge (and the SH basis
   convention) drops out of the comparison entirely, leaving exactly the
   composition under test: edge radial -> expand/concat -> rotate -> SO2
   conv -> sep-S2 activation -> SO2 conv -> alpha softmax -> rotate back ->
   reduce -> projection (+ norms/residuals/FFN at the block level).
4. **FeedForwardNetwork** in all three activation variants (sep-S2 / gate /
   grid-MLP, EF_layers.py:152-270) whole-module at fp64.

Every deterministic constituent is ALSO anchored individually (Wigner,
coefficient mapping, SO2_m/SO2 convolution incl. radial + extra-m0,
RadialFunction, SO3_LinearV2, all three equivariant norms, Gate/S2/sep-S2
activations, EdgeDegreeEmbedding via its basis-invariant content), and the
ENTIRE CProMG transformer is anchored end-to-end on the real 7cff complex
(encoder with its kNN/undirected/smearing/Laplacian graph chain, second
encoder with cross-attention, decoder incl. real token tensors, vocab
projection). The equivariant stack's geometry-to-frame path (which the
Wigner injection bypasses) is covered by rotation-equivariance and gauge
tests (tests/test_equivariant_layers.py) at 1e-5 and the edge-alignment
probe in test_edge_degree_embedding_matches_reference.
"""
from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _x64():
    """fp64 for parity asserts, restored afterwards (other tests run fp32)."""
    import jax

    prev = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)

REF = "/root/reference/model/EF_layers.py"
LMAX, MMAX = 6, 2


# ---------------------------------------------------------------------------
# reference import with stubs for the graph/e3nn libs absent from this env
# ---------------------------------------------------------------------------


def _load_reference_ef_layers():
    if "ref_ef_layers" in sys.modules:
        return sys.modules["ref_ef_layers"]
    e3nn = types.ModuleType("e3nn")
    o3 = types.ModuleType("e3nn.o3")
    o3.FromS2Grid = object
    o3.ToS2Grid = object
    e3nn.o3 = o3
    pyg = types.ModuleType("torch_geometric")
    stubs = {"e3nn": e3nn, "e3nn.o3": o3, "torch_geometric": pyg}
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_ef_layers", REF)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_ef_layers"] = mod
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
    return mod


def _wigner_ref(mod, l, a, b, c):
    t = lambda v: torch.tensor([v], dtype=torch.float64)
    return mod.wigner_D(l, t(a), t(b), t(c))[0].numpy()


# e3nn's l=1 basis order is (y, z, x): map its D_1 back to a 3x3 rotation
_P_YZX = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], float)


def test_wigner_matches_reference_jd():
    """Our generated jd.npz reproduces the reference's e3nn Wigner-D blocks
    with the *identity* coefficient basis map, to float64 precision."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.equivariant.wigner import wigner_blocks

    mod = _load_reference_ef_layers()
    rng = np.random.default_rng(0)
    worst = 0.0
    for _ in range(5):
        a, b, c = rng.uniform(-np.pi, np.pi, 3)
        R = _P_YZX.T @ _wigner_ref(mod, 1, a, b, c) @ _P_YZX
        ours = wigner_blocks(jnp.asarray(R[None]), LMAX, LMAX, dtype=jnp.float64)
        for l in range(LMAX + 1):
            ref = _wigner_ref(mod, l, a, b, c)
            worst = max(worst, float(np.abs(ref - np.asarray(ours[l][0])).max()))
    assert worst < 1e-12, worst


def test_wigner_truncated_rows_match_reference():
    """Truncated (|m| <= mmax) blocks equal the corresponding rows of the
    reference's full matrices — the row selection the reference performs via
    coefficient_idx masking (EF_layers.py:495-497)."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.equivariant.wigner import wigner_blocks

    mod = _load_reference_ef_layers()
    rng = np.random.default_rng(1)
    a, b, c = rng.uniform(-np.pi, np.pi, 3)
    R = _P_YZX.T @ _wigner_ref(mod, 1, a, b, c) @ _P_YZX
    ours = wigner_blocks(jnp.asarray(R[None]), LMAX, MMAX, dtype=jnp.float64)
    for l in range(LMAX + 1):
        mm = min(l, MMAX)
        ref = _wigner_ref(mod, l, a, b, c)[l - mm : l + mm + 1, :]
        np.testing.assert_allclose(np.asarray(ours[l][0]), ref, atol=1e-12)


def test_coefficient_mapping_matches_reference():
    """Golden comparison against the reference CoefficientMappingModule."""
    from singa_tpu.equivariant.so3 import CoefficientMapping

    mod = _load_reference_ef_layers()
    ref = mod.CoefficientMappingModule([LMAX], [LMAX], device="cpu")
    ours = CoefficientMapping(LMAX, MMAX)

    # degree/order bookkeeping over the full (untruncated) layout
    l_of = ref.l_harmonic.numpy()
    np.testing.assert_array_equal(l_of, ours.l_of_full)

    # truncated coefficient positions: reference masks the full layout
    trunc_idx = ref.coefficient_idx(LMAX, MMAX).numpy()
    expect_full_positions = []
    for l in range(LMAX + 1):
        mm = min(l, MMAX)
        for m in range(-mm, mm + 1):
            expect_full_positions.append(l * l + (m + l))
    np.testing.assert_array_equal(trunc_idx, expect_full_positions)

    # to_m permutation over the truncated layout: reference builds a 0/1
    # permutation matrix (EF_layers.py:1457-1476); ours is its gather form
    ref_t = mod.CoefficientMappingModule([LMAX], [MMAX], device="cpu")
    to_m = ref_t.to_m.numpy()
    perm = np.argmax(to_m, axis=1)
    assert (to_m.sum(1) == 1).all() and (to_m.sum(0) == 1).all()
    np.testing.assert_array_equal(perm, ours.l_to_m)
    np.testing.assert_array_equal(ref_t.m_size.numpy(), ours.m_size)

    # m-truncation rescale used by rotate_inv (EF_layers.py:1530-1549)
    resc = ref.get_rotate_inv_rescale(LMAX, MMAX).numpy()[0]
    # reference returns [(lmax+1)^2, n_trunc]; nonzero pattern is the
    # block-diagonal selection, per-coefficient value sqrt((2l+1)/(2mmax+1))
    ours_scale = ours.rotate_inv_rescale
    row_scale = resc.max(axis=1)
    # rows of degree l > mmax carry the rescale on their kept columns
    np.testing.assert_allclose(row_scale, ours_scale, atol=1e-7)


def test_z_rot_structure_matches_reference():
    """Our structured z-rotation application (_z_left/_z_right) equals the
    reference's explicit _z_rot_mat matmuls (EF_layers.py:2239-2251)."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.equivariant.wigner import _z_left, _z_right

    mod = _load_reference_ef_layers()
    rng = np.random.default_rng(2)
    for l in (0, 1, 3, 6):
        n = 2 * l + 1
        ang = float(rng.uniform(-np.pi, np.pi))
        M = rng.normal(size=(n, n))
        Z = mod._z_rot_mat(torch.tensor([ang], dtype=torch.float64), l)[0].numpy()
        m_vals = jnp.arange(-l, l + 1, dtype=jnp.float64)
        got_l = np.asarray(
            _z_left(jnp.asarray([ang]), jnp.asarray(M[None]), m_vals)[0]
        )
        got_r = np.asarray(
            _z_right(jnp.asarray([ang]), jnp.asarray(M[None]), m_vals)[0]
        )
        # e3nn's frequencies run l..-l (row-reversed relative to ours):
        # its Z(angle) equals our Z(angle) transposed basis; empirically
        # Z_ref @ M == our _z_left(angle) and M @ Z_ref == our _z_right(angle)
        np.testing.assert_allclose(got_l, Z @ M, atol=1e-12)
        np.testing.assert_allclose(got_r, M @ Z, atol=1e-12)


# ---------------------------------------------------------------------------
# round 3: golden anchoring of the SO2 / radial / norm / activation stack
# (reference EF_layers.py:677-875, 1634-1665, 1683-1773, 1861-2192)
# ---------------------------------------------------------------------------

C_IN, F_OUT, DE, EXTRA = 8, 4, 12, 5
N_TRUNC = sum(2 * min(l, MMAX) + 1 for l in range(LMAX + 1))  # 29


def _f64_scope():
    import jax.numpy as jnp

    from singa_tpu.dtypes import compute_dtype_scope

    return compute_dtype_scope(jnp.float64)


def _t64(a):
    return torch.tensor(np.asarray(a), dtype=torch.float64)


def _radial_params_to_ours(net):
    """torch RadialFunction.net (Linear/LayerNorm/SiLU sequence) -> flax
    RadialMLP param dict ({Linear_i/Dense_0, LayerNorm_i})."""
    import torch.nn as nn

    out = {}
    li = ni = 0
    for m in net:
        if isinstance(m, nn.Linear):
            out[f"Linear_{li}"] = {
                "Dense_0": {
                    "kernel": np.asarray(m.weight.detach().numpy().T),
                    "bias": np.asarray(m.bias.detach().numpy()),
                }
            }
            li += 1
        elif isinstance(m, nn.LayerNorm):
            out[f"LayerNorm_{ni}"] = {
                "scale": np.asarray(m.weight.detach().numpy()),
                "bias": np.asarray(m.bias.detach().numpy()),
            }
            ni += 1
    return out


def test_radial_function_matches_reference():
    """RadialFunction (EF_layers.py:1634-1657) == RadialMLP with transposed
    torch weights, fp64."""
    from singa_tpu.equivariant.layers import RadialMLP

    mod = _load_reference_ef_layers()
    torch.manual_seed(0)
    ref = mod.RadialFunction([DE, 16, 16, 24], device="cpu").double()
    x = np.random.default_rng(3).normal(size=(10, DE))
    want = ref(_t64(x)).detach().numpy()

    with _f64_scope():
        import jax.numpy as jnp

        ours = RadialMLP((16, 16, 24))
        params = {"params": _radial_params_to_ours(ref.net)}
        got = ours.apply(params, jnp.asarray(x, jnp.float64))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def _so2_weight_map(ref, n0, extra):
    """Reference SO2_Convolution parameters -> our SO2Conv param dict."""
    W0 = ref.fc_m0.weight.detach().numpy().T  # [in, out]; extra cols FIRST
    b0 = ref.fc_m0.bias.detach().numpy()
    out = {
        "w_m0": np.concatenate([W0[:, extra:], W0[:, :extra]], axis=1),
        "b_m0": np.concatenate([b0[extra:], b0[:extra]]),
    }
    for m, conv in enumerate(ref.so2_m_conv, start=1):
        out[f"w_m{m}"] = conv.fc.weight.detach().numpy().T
    if ref.rad_func is not None:
        out["RadialMLP_0"] = _radial_params_to_ours(ref.rad_func.net)
    return out


@pytest.mark.parametrize("radial,extra", [(False, 0), (True, 0), (True, EXTRA)])
def test_so2_convolution_matches_reference(radial, extra):
    """SO2_Convolution + SO2_m_Convolution (EF_layers.py:677-875): internal
    and radial-modulated paths, with and without extra m=0 channels, fp64."""
    from singa_tpu.equivariant.layers import SO2Conv

    mod = _load_reference_ef_layers()
    torch.manual_seed(1)
    mapping = mod.CoefficientMappingModule([LMAX], [MMAX], device="cpu")
    ref = mod.SO2_Convolution(
        sphere_channels=C_IN,
        m_output_channels=F_OUT,
        lmax_list=[LMAX],
        mmax_list=[MMAX],
        mappingReduced=mapping,
        edge_channels_list=[DE, 16, 16] if radial else None,
        extra_m0_output_channels=extra or None,
        internal_weights=not radial,
        device="cpu",
    ).double()

    rng = np.random.default_rng(5)
    E = 11
    x_np = rng.normal(size=(E, N_TRUNC, C_IN))
    xe_np = rng.normal(size=(E, DE))

    x_ref = mod.SO3_Embedding(0, [LMAX], C_IN, dtype=torch.float64, device="cpu")
    x_ref.set_embedding(_t64(x_np))
    x_ref.set_lmax_mmax([LMAX], [MMAX])
    got_ref = ref(x_ref, _t64(xe_np))
    if extra:
        want = got_ref[0].embedding.detach().numpy()
        want_extra = got_ref[1].detach().numpy()
    else:
        want = got_ref.embedding.detach().numpy()

    with _f64_scope():
        import jax.numpy as jnp

        ours = SO2Conv(
            features=F_OUT,
            lmax=LMAX,
            mmax=MMAX,
            edge_channels=(16, 16) if radial else None,
            extra_m0_features=extra or None,
        )
        params = {"params": _so2_weight_map(ref, LMAX + 1, extra)}
        args = (jnp.asarray(x_np),)
        if radial:
            args = (jnp.asarray(x_np), jnp.asarray(xe_np))
        got = ours.apply(params, *args)
    if extra:
        got, got_extra = got
        np.testing.assert_allclose(np.asarray(got_extra), want_extra, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_equivariant_norms_match_reference():
    """The three norm types (EF_layers.py:1861-2192) against torch fp64:
    layer_norm / layer_norm_sh / rms_norm_sh with non-trivial affine params."""
    from singa_tpu.equivariant.layers import (
        EquivariantLayerNorm,
        EquivariantLayerNormSH,
        EquivariantRMSNorm,
    )

    mod = _load_reference_ef_layers()
    rng = np.random.default_rng(7)
    N = 9
    x_np = rng.normal(size=(N, (LMAX + 1) ** 2, C_IN))
    w_np = rng.normal(size=(LMAX + 1, C_IN)) * 0.3 + 1.0
    b_np = rng.normal(size=(C_IN,)) * 0.1

    import jax.numpy as jnp

    # --- layer_norm: EquivariantLayerNormArray ---
    ref = mod.EquivariantLayerNormArray(LMAX, C_IN, device="cpu").double()
    with torch.no_grad():
        ref.affine_weight.copy_(_t64(w_np))
        ref.affine_bias.copy_(_t64(b_np))
    want = ref(_t64(x_np)).detach().numpy()
    with _f64_scope():
        got = EquivariantLayerNorm(lmax=LMAX).apply(
            {"params": {"weight": jnp.asarray(w_np), "bias": jnp.asarray(b_np)}},
            jnp.asarray(x_np),
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)

    # --- layer_norm_sh: EquivariantLayerNormArraySphericalHarmonics ---
    ref = mod.EquivariantLayerNormArraySphericalHarmonics(
        LMAX, C_IN, device="cpu"
    ).double()
    w_sh = rng.normal(size=(LMAX, C_IN)) * 0.3 + 1.0
    l0_w = rng.normal(size=(C_IN,)) * 0.2 + 1.0
    l0_b = rng.normal(size=(C_IN,)) * 0.1
    with torch.no_grad():
        ref.affine_weight.copy_(_t64(w_sh))
        ref.norm_l0.weight.copy_(_t64(l0_w))
        ref.norm_l0.bias.copy_(_t64(l0_b))
    want = ref(_t64(x_np)).detach().numpy()
    with _f64_scope():
        got = EquivariantLayerNormSH(lmax=LMAX).apply(
            {
                "params": {
                    "weight": jnp.asarray(w_sh),
                    "norm_l0": {
                        "scale": jnp.asarray(l0_w),
                        "bias": jnp.asarray(l0_b),
                    },
                }
            },
            jnp.asarray(x_np),
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)

    # --- rms_norm_sh: EquivariantRMSNormArraySphericalHarmonicsV2 ---
    ref = mod.EquivariantRMSNormArraySphericalHarmonicsV2(
        LMAX, C_IN, device="cpu"
    ).double()
    with torch.no_grad():
        ref.affine_weight.copy_(_t64(w_np))
        ref.affine_bias.copy_(_t64(b_np))
        # the reference CREATES balance_degree_weight in float32 (the 1/(2l+1)
        # entries are rounded before .double() upcasts them, EF_layers.py:
        # 2143-2149) — replace with exact f64 values so the comparison
        # measures the computation, not that constant's rounding (6.4e-8).
        l_of = np.asarray([l for l in range(LMAX + 1) for _ in range(2 * l + 1)])
        exact = (1.0 / ((2.0 * l_of + 1.0) * (LMAX + 1)))[:, None]
        ref.balance_degree_weight.copy_(_t64(exact))
    want = ref(_t64(x_np)).detach().numpy()
    with _f64_scope():
        got = EquivariantRMSNorm(lmax=LMAX).apply(
            {"params": {"weight": jnp.asarray(w_np), "bias": jnp.asarray(b_np)}},
            jnp.asarray(x_np),
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_gate_activation_matches_reference():
    """GateActivation (EF_layers.py:1683-1733), parameter-free, fp64."""
    from singa_tpu.equivariant.layers import gate_activation

    mod = _load_reference_ef_layers()
    rng = np.random.default_rng(11)
    N = 6
    n_comp = sum(min(2 * l + 1, 2 * MMAX + 1) for l in range(1, LMAX + 1))
    x_np = rng.normal(size=(N, 1 + n_comp, C_IN))
    g_np = rng.normal(size=(N, LMAX * C_IN))

    ref = mod.GateActivation(LMAX, MMAX, C_IN, device="cpu")
    want = ref(_t64(g_np), _t64(x_np)).detach().numpy()
    with _f64_scope():
        import jax.numpy as jnp

        got = gate_activation(jnp.asarray(g_np), jnp.asarray(x_np), LMAX, MMAX)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


class _GridStub:
    """SO3_grid stand-in feeding the reference S2Activation OUR grid
    matrices, so the einsum/narrow/concat structure is compared 1:1."""

    def __init__(self, tg, fg):
        self._tg, self._fg = tg, fg

    def get_to_grid_mat(self, device=None):
        return self._tg

    def get_from_grid_mat(self, device=None):
        return self._fg


def test_s2_activation_matches_reference():
    """S2Activation / SeparableS2Activation (EF_layers.py:1736-1773) applied
    to the same grid matrices: the transform-act-transform structure and the
    separable scalar recombine match in fp64. (The grid matrices themselves
    are ours on both sides — e3nn's grid builders are unavailable; the grid
    basis is independently verified by band-limit/equivariance tests.)"""
    from singa_tpu.equivariant.grid import get_grid
    from singa_tpu.equivariant.layers import s2_activation, separable_s2_activation

    mod = _load_reference_ef_layers()
    grid = get_grid(LMAX, LMAX)
    tg = np.asarray(grid.to_grid_mat, np.float64)  # [b, a, coeffs]
    fg = np.asarray(grid.from_grid_mat, np.float64)
    stub = {LMAX: {LMAX: _GridStub(_t64(tg), _t64(fg))}}

    rng = np.random.default_rng(13)
    N = 5
    x_np = rng.normal(size=(N, (LMAX + 1) ** 2, C_IN))
    s_np = rng.normal(size=(N, C_IN))

    ref = mod.S2Activation(LMAX, LMAX)
    want = ref(_t64(x_np), stub).detach().numpy()
    with _f64_scope():
        import jax.numpy as jnp

        got = s2_activation(jnp.asarray(x_np), LMAX, LMAX)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)

    ref_sep = mod.SeparableS2Activation(LMAX, LMAX)
    want = ref_sep(_t64(s_np), _t64(x_np), stub).detach().numpy()
    with _f64_scope():
        got = separable_s2_activation(
            jnp.asarray(s_np), jnp.asarray(x_np), LMAX, LMAX
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


@pytest.mark.parametrize("variant", ["s2", "gate", "grid"])
def test_feedforward_network_matches_reference(variant):
    """The whole FeedForwardNetwork module (EF_layers.py:152-270) in all three
    activation variants — sep-S2 (shipped default), gate (use_gate_act), and
    grid MLP (use_grid_mlp + use_sep_s2_act) — against torch fp64 with copied
    parameters."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.dtypes import compute_dtype_scope
    from singa_tpu.equivariant.attention import FeedForwardNetwork
    from singa_tpu.equivariant.grid import get_grid

    mod = _load_reference_ef_layers()
    torch.manual_seed(3)
    rng = np.random.default_rng(17)
    C, H, Co, N = 8, 12, 10, 5

    grid = get_grid(LMAX, LMAX)
    stub = _GridStub(
        _t64(np.asarray(grid.to_grid_mat, np.float64)),
        _t64(np.asarray(grid.from_grid_mat, np.float64)),
    )
    stub.mapping = mod.CoefficientMappingModule([LMAX], [LMAX], device="cpu")
    so3_grid = {LMAX: {LMAX: stub}}

    ref = mod.FeedForwardNetwork(
        sphere_channels=C,
        hidden_channels=H,
        output_channels=Co,
        lmax_list=[LMAX],
        mmax_list=[LMAX],
        SO3_grid=so3_grid,
        use_gate_act=(variant == "gate"),
        use_grid_mlp=(variant == "grid"),
        use_sep_s2_act=True,
        device="cpu",
    ).double()

    x_np = rng.normal(size=(N, (LMAX + 1) ** 2, C))
    emb = mod.SO3_Embedding(N, [LMAX], C, device="cpu", dtype=torch.float64)
    emb.set_embedding(torch.tensor(x_np))
    with torch.no_grad():
        want = ref(emb).embedding.numpy()

    t = lambda p: p.detach().numpy()
    mapped = {
        "w1": t(ref.so3_linear_1.weight),
        "b1": t(ref.so3_linear_1.bias),
        "w2": t(ref.so3_linear_2.weight),
        "b2": t(ref.so3_linear_2.bias),
    }
    if variant == "s2":
        mapped["gate_kernel"] = t(ref.gating_linear.weight).T
        mapped["gate_bias"] = t(ref.gating_linear.bias)
    elif variant == "gate":
        mapped["gate_kernel"] = t(ref.gating_linear.weight).T
        mapped["gate_bias"] = t(ref.gating_linear.bias)
    else:
        mapped["scalar_kernel"] = t(ref.scalar_mlp[0].weight).T
        mapped["scalar_bias"] = t(ref.scalar_mlp[0].bias)
        for i, idx in enumerate((0, 2, 4)):
            mapped[f"grid_mlp_{i}"] = t(ref.grid_mlp[idx].weight).T

    ours = FeedForwardNetwork(
        hidden_channels=H, output_channels=Co, lmax=LMAX, activation=variant
    )
    with compute_dtype_scope(jnp.float64):
        params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]
        import chex

        chex.assert_trees_all_equal_structs(mapped, params)
        got = ours.apply({"params": mapped}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


# ---------------------------------------------------------------------------
# CProMG decoder golden parity (reference model/CProMG.py:108-423, pure torch
# once the graph libraries are stubbed)
# ---------------------------------------------------------------------------


def _load_reference_cpromg():
    if "ref_cpromg" in sys.modules:
        return sys.modules["ref_cpromg"]
    import types as _t

    dgl = _t.ModuleType("dgl")
    pyg = _t.ModuleType("torch_geometric")
    pyg_data = _t.ModuleType("torch_geometric.data")
    pyg_data.Data = object
    pyg_data.HeteroData = object
    pyg_nn = _t.ModuleType("torch_geometric.nn")
    pyg_nn.knn_graph = None
    pyg_utils = _t.ModuleType("torch_geometric.utils")
    pyg_utils.get_laplacian = None
    pyg_utils.to_dense_batch = None
    pyg_utils.to_undirected = None
    pyg.data, pyg.nn, pyg.utils = pyg_data, pyg_nn, pyg_utils
    tsc = _t.ModuleType("torch_scatter")
    tsc.scatter_sum = None
    tsc.scatter_softmax = None
    tcl = _t.ModuleType("torch_cluster")
    stubs = {
        "dgl": dgl,
        "torch_geometric": pyg,
        "torch_geometric.data": pyg_data,
        "torch_geometric.nn": pyg_nn,
        "torch_geometric.utils": pyg_utils,
        "torch_scatter": tsc,
        "torch_cluster": tcl,
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_cpromg", "/root/reference/model/CProMG.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_cpromg"] = mod
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)
    sys.modules["ref_cpromg"] = mod
    return mod


def _install_cpromg_ops(mod):
    """Real torch implementations of the PyG/torch_scatter ops the reference
    imports (stubbed to None at module load); idempotent."""

    def knn_graph(pos, k, batch=None, flow="target_to_source"):
        n = pos.shape[0]
        k = min(k, n - 1)  # PyG returns at most n-1 neighbours
        d = torch.cdist(pos, pos)
        d.fill_diagonal_(float("inf"))
        nbr = d.topk(k, largest=False).indices  # [n, k]
        center = torch.arange(n).repeat_interleave(k)
        return torch.stack([center, nbr.reshape(-1)])

    def to_undirected(edge_index, edge_attr, reduce="mean"):
        n = int(edge_index.max()) + 1
        ei = torch.cat([edge_index, edge_index.flip(0)], dim=1)
        ea = torch.cat([edge_attr, edge_attr])
        key = ei[0] * n + ei[1]
        uniq, inv = key.unique(return_inverse=True)
        cnt = torch.zeros(len(uniq), dtype=ea.dtype).index_add(
            0, inv, torch.ones_like(ea)
        )
        summed = torch.zeros(len(uniq), dtype=ea.dtype).index_add(0, inv, ea)
        return torch.stack([uniq // n, uniq % n]), summed / cnt

    def get_laplacian(edge_index, edge_weight, normalization=None):
        n = int(edge_index.max()) + 1
        row = edge_index[0]
        deg = torch.zeros((n,) + edge_weight.shape[1:], dtype=edge_weight.dtype)
        deg = deg.index_add(0, row, edge_weight)
        loop = torch.arange(n)
        ei = torch.cat([edge_index, torch.stack([loop, loop])], dim=1)
        ew = torch.cat([-edge_weight, deg], dim=0)
        return ei, ew

    def to_dense_batch(x, batch):
        return x.unsqueeze(0), torch.ones(1, x.shape[0], dtype=torch.bool)

    def scatter_sum(src, index, dim=0, dim_size=None):
        n = dim_size if dim_size is not None else int(index.max()) + 1
        out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
        return out.index_add(0, index, src)

    def scatter_softmax(src, index, dim=0):
        n = int(index.max()) + 1
        idx_full = index.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
        mx = torch.full((n,) + src.shape[1:], -torch.inf, dtype=src.dtype)
        mx = mx.scatter_reduce(0, idx_full, src, reduce="amax")
        e = torch.exp(src - mx[index])
        den = scatter_sum(e, index, 0, n)
        return e / den[index]

    mod.knn_graph = knn_graph
    mod.to_undirected = to_undirected
    mod.get_laplacian = get_laplacian
    mod.to_dense_batch = to_dense_batch
    mod.scatter_sum = scatter_sum
    mod.scatter_softmax = scatter_softmax
    return mod



def _t32(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def _lin_from(tmod):
    """torch Linear -> flax {'Dense_0': {kernel [in,out], bias}}"""
    return {
        "Dense_0": {
            "kernel": np.ascontiguousarray(tmod.weight.detach().numpy().T),
            "bias": tmod.bias.detach().numpy(),
        }
    }


def _ln_from(tmod):
    return {
        "scale": tmod.weight.detach().numpy(),
        "bias": tmod.bias.detach().numpy(),
    }


def _conv1_from(tmod):
    """torch Conv1d(k=1) -> flax Dense params."""
    w = tmod.weight.detach().numpy()[:, :, 0]  # [out, in]
    return {
        "Dense_0": {
            "kernel": np.ascontiguousarray(w.T),
            "bias": tmod.bias.detach().numpy(),
        }
    }


def _mha_from(tmod):
    return {
        "W_Q": _lin_from(tmod.W_Q),
        "W_K": _lin_from(tmod.W_K),
        "W_V": _lin_from(tmod.W_V),
        "linear": _lin_from(tmod.linear),
        "layer_norm": _ln_from(tmod.layer_norm),
    }


def test_cpromg_decoder_matches_reference():
    """Full teacher-forced decoder stack (embeddings + property prefix +
    causal/pad masks + N DecoderLayers) against the reference's Decoder
    (CProMG.py:371-423) with copied weights."""
    import types as _t

    import chex
    import jax
    import jax.numpy as jnp

    from singa_tpu.config import DecoderConfig, SMI_VOCAB
    from singa_tpu.dtypes import set_compute_dtype
    from singa_tpu.models.cpromg import Decoder

    set_compute_dtype("float32")
    mod = _load_reference_cpromg()
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    C, KC, H, L, P = 64, 64, 4, 2, 3
    B, T, S = 2, 12, 9
    ref_cfg = _t.SimpleNamespace(
        hidden_channels=C,
        key_channels=KC,
        num_heads=H,
        num_interactions=L,
        smiVoc=list(SMI_VOCAB),
    )
    ref = mod.Decoder(ref_cfg, num_props=P, device="cpu").eval()

    pad = SMI_VOCAB.index("^")
    tokens_np = rng.integers(1, 40, (B, T)).astype(np.int64)
    tokens_np[0, -3:] = pad
    # reference pads with smiVoc.index('^') and masks those keys
    tokens_np[tokens_np == pad] = pad
    enc_np = rng.normal(size=(B, S, C)).astype(np.float32)
    prop_np = rng.normal(size=(B, P)).astype(np.float32)
    enc_pad_np = np.zeros((B, 1, S), bool)
    enc_pad_np[:, :, -2:] = True

    with torch.no_grad():
        want = ref(
            torch.tensor(tokens_np),
            _t32(enc_np),
            torch.tensor(enc_pad_np),
            tgt_len=T,
            prop=_t32(prop_np),
        ).numpy()

    cfg = DecoderConfig(
        tgt_len=T, hidden_channels=C, key_channels=KC, num_heads=H,
        num_interactions=L, ffn_hidden=1024, vocab_size=len(SMI_VOCAB),
    )
    dec = Decoder(cfg, num_props=P, pad_token=pad)
    params = dec.init(
        jax.random.PRNGKey(0),
        jnp.asarray(tokens_np, jnp.int32),
        jnp.asarray(enc_np),
        jnp.asarray(enc_pad_np),
        jnp.asarray(prop_np),
    )["params"]

    mapped = dict(params)
    mapped["mol_emb"] = {"embedding": ref.mol_emb.weight.detach().numpy()}
    mapped["type_emb"] = {"embedding": ref.type_emb.weight.detach().numpy()}
    mapped["prop_nn"] = _lin_from(ref.prop_nn)
    for i, layer in enumerate(ref.layers):
        mapped[f"layer_{i}"] = {
            "dec_self_attn": _mha_from(layer.dec_self_attn),
            "dec_enc_attn": _mha_from(layer.dec_enc_attn),
            "pos_ffn": {
                "conv1": _conv1_from(layer.pos_ffn.conv1),
                "conv2": _conv1_from(layer.pos_ffn.conv2),
                "layer_norm": _ln_from(layer.pos_ffn.layer_norm),
            },
        }
    chex.assert_trees_all_equal_structs(mapped, params)

    got = dec.apply(
        {"params": mapped},
        jnp.asarray(tokens_np, jnp.int32),
        jnp.asarray(enc_np),
        jnp.asarray(enc_pad_np),
        jnp.asarray(prop_np),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


def test_cpromg_graph_attention_matches_reference():
    """Segment-form graph MHA (our GraphMHA) vs the reference's
    MultiHeadAttention (CProMG.py:19-78), with real torch implementations
    injected for the absent torch_scatter ops. The dense and neighbor-list
    encoder forms are parity-tested against this segment form elsewhere, so
    this anchors all three to torch. fp64 both sides: the fp32 stack
    accumulates ~5e-4 through MLP+softmax+LN, which would mask real bugs."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.dtypes import compute_dtype_scope
    from singa_tpu.models.cpromg import GraphMHA
    from singa_tpu.ops.knn import EdgeList

    mod = _install_cpromg_ops(_load_reference_cpromg())

    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    C, De, KC, H = 64, 16, 32, 4
    N, E = 20, 70
    ref = mod.MultiHeadAttention(C, De, KC, num_heads=H, device="cpu").double().eval()

    x_np = rng.normal(size=(N, C))
    ea_np = rng.normal(size=(E, De))
    row = rng.integers(0, N, E)
    col = rng.integers(0, N, E)
    with torch.no_grad():
        want = ref(
            torch.tensor(x_np), torch.tensor(np.stack([row, col])),
            torch.tensor(ea_np),
        ).numpy()

    ours = GraphMHA(hidden_channels=C, key_channels=KC, num_heads=H)
    edges = EdgeList(
        jnp.asarray(row, jnp.int32), jnp.asarray(col, jnp.int32),
        jnp.ones((E,), bool),
    )
    x64 = jnp.asarray(x_np, jnp.float64)
    ea64 = jnp.asarray(ea_np, jnp.float64)
    with compute_dtype_scope(jnp.float64):
        params = ours.init(jax.random.PRNGKey(0), x64, edges, ea64)["params"]

    def grouped_from(tconv, h):
        w = tconv.weight.detach().numpy()[:, :, 0]  # [h*out, in_per_group]
        out_pg = w.shape[0] // h
        return {"weight": w.reshape(h, out_pg, w.shape[1]).transpose(0, 2, 1)}

    def mlp_from(tseq):
        return {"Linear_0": _lin_from(tseq[0]), "Linear_1": _lin_from(tseq[2])}

    mapped = {
        "k_lin": grouped_from(ref.k_lin, H),
        "q_lin": grouped_from(ref.q_lin, H),
        "v_lin": grouped_from(ref.v_lin, H),
        "weight_k_net": mlp_from(ref.weight_k_net),
        "weight_k_lin": _lin_from(ref.weight_k_lin),
        "weight_v_net": mlp_from(ref.weight_v_net),
        "weight_v_lin": _lin_from(ref.weight_v_lin),
        "centroid_lin": _lin_from(ref.centroid_lin),
        "out_transform": _lin_from(ref.out_transform),
        "layer_norm": _ln_from(ref.layer_norm),
    }
    import chex

    chex.assert_trees_all_equal_structs(mapped, params)
    mapped = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), mapped)
    with compute_dtype_scope(jnp.float64):
        got = ours.apply({"params": mapped}, x64, edges, ea64)
    # 1e-7, not 1e-10: the reference's ShiftedSoftplus stores its ln(2)
    # shift via float32 .item() (CProMG.py:493), 1.9e-9 off the exact
    # value we use; it compounds through the MLP chains
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-7)


def test_cpromg_decoder_parity_on_bundled_complex_tokens():
    """Same decoder golden comparison driven by the REAL token tensors of the
    bundled reference complexes (BASELINE.md: 'per-layer fp32 match ... on
    bundled example complexes') and their real property-threshold vector."""
    import types as _t

    import chex
    import jax
    import jax.numpy as jnp

    from singa_tpu.config import DecoderConfig, SMI_VOCAB
    from singa_tpu.dtypes import set_compute_dtype
    from singa_tpu.models.cpromg import Decoder

    set_compute_dtype("float32")
    mod = _load_reference_cpromg()
    torch.manual_seed(3)
    rng = np.random.default_rng(3)

    z1 = np.load("data/ref_graphs/train/4agq_5a7b.npz")
    z2 = np.load("data/ref_graphs/train/5cp5_4nue.npz")
    T = 64  # truncated window keeps the test fast; covers real pad tokens
    tokens_np = np.stack(
        [z1["tokens.input"][:T], z2["tokens.input"][:T]]
    ).astype(np.int64)
    # real property conditioning bits (GAN.py:37-44 thresholds)
    prop_np = np.stack(
        [
            [float(z["props.vina"]) < -7.5, float(z["props.qed"]) > 0.6,
             float(z["props.sas"]) < 4.0]
            for z in (z1, z2)
        ]
    ).astype(np.float32)

    C, KC, H, L, P = 64, 64, 4, 2, 3
    B, S = 2, 9
    ref_cfg = _t.SimpleNamespace(
        hidden_channels=C, key_channels=KC, num_heads=H,
        num_interactions=L, smiVoc=list(SMI_VOCAB),
    )
    ref = mod.Decoder(ref_cfg, num_props=P, device="cpu").eval()
    enc_np = rng.normal(size=(B, S, C)).astype(np.float32)
    enc_pad_np = np.zeros((B, 1, S), bool)
    enc_pad_np[:, :, -1:] = True
    with torch.no_grad():
        want = ref(
            torch.tensor(tokens_np), _t32(enc_np), torch.tensor(enc_pad_np),
            tgt_len=T, prop=_t32(prop_np),
        ).numpy()

    pad = SMI_VOCAB.index("^")
    cfg = DecoderConfig(
        tgt_len=T, hidden_channels=C, key_channels=KC, num_heads=H,
        num_interactions=L, ffn_hidden=1024, vocab_size=len(SMI_VOCAB),
    )
    dec = Decoder(cfg, num_props=P, pad_token=pad)
    params = dec.init(
        jax.random.PRNGKey(0), jnp.asarray(tokens_np, jnp.int32),
        jnp.asarray(enc_np), jnp.asarray(enc_pad_np), jnp.asarray(prop_np),
    )["params"]
    mapped = dict(params)
    mapped["mol_emb"] = {"embedding": ref.mol_emb.weight.detach().numpy()}
    mapped["type_emb"] = {"embedding": ref.type_emb.weight.detach().numpy()}
    mapped["prop_nn"] = _lin_from(ref.prop_nn)
    for i, layer in enumerate(ref.layers):
        mapped[f"layer_{i}"] = {
            "dec_self_attn": _mha_from(layer.dec_self_attn),
            "dec_enc_attn": _mha_from(layer.dec_enc_attn),
            "pos_ffn": {
                "conv1": _conv1_from(layer.pos_ffn.conv1),
                "conv2": _conv1_from(layer.pos_ffn.conv2),
                "layer_norm": _ln_from(layer.pos_ffn.layer_norm),
            },
        }
    chex.assert_trees_all_equal_structs(mapped, params)
    got = dec.apply(
        {"params": mapped}, jnp.asarray(tokens_np, jnp.int32),
        jnp.asarray(enc_np), jnp.asarray(enc_pad_np), jnp.asarray(prop_np),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


def test_so3_linear_matches_reference():
    """SO3_LinearV2 (EF_layers.py:624-671) vs our SO3Linear with copied
    per-degree weights, fp64."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.dtypes import compute_dtype_scope
    from singa_tpu.equivariant.layers import SO3Linear

    mod = _load_reference_ef_layers()
    torch.manual_seed(5)
    rng = np.random.default_rng(5)
    CI, CO = 16, 24
    N = 7
    ref = mod.SO3_LinearV2(CI, CO, LMAX, device="cpu").double()
    with torch.no_grad():
        ref.bias.copy_(torch.tensor(rng.normal(size=(CO,))))

    x_np = rng.normal(size=(N, (LMAX + 1) ** 2, CI))
    emb = mod.SO3_Embedding(
        N, [LMAX], CI, device="cpu", dtype=torch.float64
    )
    emb.set_embedding(torch.tensor(x_np))
    with torch.no_grad():
        want = ref(emb).embedding.numpy()

    ours = SO3Linear(features=CO, lmax=LMAX)
    with compute_dtype_scope(jnp.float64):
        params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]
        mapped = {
            "weight": ref.weight.detach().numpy(),
            "bias": ref.bias.detach().numpy(),
        }
        import chex

        chex.assert_trees_all_equal_structs(mapped, params)
        got = ours.apply({"params": mapped}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_edge_degree_embedding_matches_reference():
    """EdgeDegreeEmbedding (EF_layers.py:23-149) vs torch: radial MLP ->
    m=0 edge-frame fill -> rotate back -> per-node sum -> rescale.

    Raw coefficient arrays are NOT directly comparable: the reference's
    m-order bookkeeping (to_m + _l_primary + RotationToWignerDMatrix) and
    ours realise the same representation in bases that differ by a fixed
    per-degree orthogonal intertwiner (empirically a coordinate permutation
    at l=1), and each pipeline is only self-consistent in its own basis. So
    this test anchors the basis-INDEPENDENT content, which determines the
    model: (a) our m=0 fill rotates back axially aligned with the edge
    (exact, l=1 reads back the edge direction), and (b) per-degree
    per-channel norms of the rotated-back embedding match the reference's
    exactly with one edge per node (norms are invariant to the intertwiner;
    radial weights copied)."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.equivariant import so3
    from singa_tpu.equivariant.attention import EdgeDegreeEmbedding
    from singa_tpu.ops.neighbors import EdgeEngine

    mod = _load_reference_ef_layers()

    # real e3nn angle conventions for the stubbed o3 module
    def xyz_to_angles(xyz):
        xyz = torch.nn.functional.normalize(xyz, p=2.0, dim=-1)
        xyz = xyz.clamp(-1, 1)
        beta = torch.acos(xyz[..., 1])
        alpha = torch.atan2(xyz[..., 0], xyz[..., 2])
        return alpha, beta

    def _rot_y(a):
        c, s, o, z = torch.cos(a), torch.sin(a), torch.ones_like(a), torch.zeros_like(a)
        return torch.stack(
            [torch.stack([c, z, s], -1), torch.stack([z, o, z], -1),
             torch.stack([-s, z, c], -1)], -2)

    def _rot_x(a):
        c, s, o, z = torch.cos(a), torch.sin(a), torch.ones_like(a), torch.zeros_like(a)
        return torch.stack(
            [torch.stack([o, z, z], -1), torch.stack([z, c, -s], -1),
             torch.stack([z, s, c], -1)], -2)

    mod.o3.xyz_to_angles = xyz_to_angles
    mod.o3.angles_to_matrix = lambda a, b, g: _rot_y(a) @ _rot_x(b) @ _rot_y(g)

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    C, De = 8, 16
    N = 6
    E = N  # one edge per destination node: per-node invariants stay exact
    RESCALE = 5.0

    dst = np.arange(N)
    src = (dst + rng.integers(1, N, E)) % N  # no self-loops
    pos = rng.normal(size=(N, 3)) * 3.0
    edge_vec = pos[dst] - pos[src]
    x_edge = rng.normal(size=(E, De)).astype(np.float32)

    # ---- (a) our edge frame is exactly edge-aligned on the m=0 subspace ----
    frame = so3.edge_frame(jnp.asarray(edge_vec, jnp.float32))
    mapping_t = so3.CoefficientMapping(LMAX, MMAX)
    probe = np.zeros((E, mapping_t.n_trunc, 1), np.float32)
    probe[:, 1, 0] = 1.0  # l=1, m=0 in the m-primary layout
    back = np.asarray(
        so3.rotate_inv(frame, jnp.asarray(probe), LMAX, MMAX, m_primary=True)
    )
    v = back[:, 1:4, 0]  # l=1 block, our (y, z, x) component order
    d_hat = edge_vec / np.linalg.norm(edge_vec, axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.stack([v[:, 2], v[:, 0], v[:, 1]], axis=1), d_hat, atol=1e-6
    )

    # ---- (b) per-degree norms match the torch reference ----
    mapping = mod.CoefficientMappingModule([LMAX], [MMAX], device="cpu")
    rot = mod.init_edge_rot_mat(
        torch.tensor(edge_vec, dtype=torch.float32), device="cpu"
    )
    so3rot = mod.SO3_Rotation(LMAX, device="cpu")
    so3rot.set_wigner(rot)
    ref = mod.EdgeDegreeEmbedding(
        sphere_channels=C, lmax_list=[LMAX], mmax_list=[MMAX],
        SO3_rotation=[so3rot], mappingReduced=mapping,
        max_num_elements=32, edge_channels_list=[De, 16, 16],
        use_atom_edge_embedding=False, rescale_factor=RESCALE, device="cpu",
    ).eval()
    with torch.no_grad():
        want = ref(
            torch.zeros(N, dtype=torch.long),
            torch.tensor(x_edge),
            torch.tensor(np.stack([src, dst])),
            hetero=False,
        ).embedding.numpy()

    ours = EdgeDegreeEmbedding(
        sphere_channels=C, lmax=LMAX, mmax=MMAX,
        edge_channels=(16, 16), rescale_factor=RESCALE,
    )
    K = 1
    table = np.full((1, N, K), E, np.int64)
    for e, d in enumerate(dst):
        table[0, d, 0] = e
    engine = EdgeEngine.create(
        jnp.asarray(np.stack([src, dst], -1)[None], jnp.int32),
        jnp.ones((1, E), bool),
        jnp.asarray(table, jnp.int32),
        n_src=N, n_dst=N,
    )
    xe = jnp.asarray(x_edge)
    params = ours.init(jax.random.PRNGKey(0), xe, engine, frame)["params"]
    mapped = {"RadialMLP_0": _radial_params_to_ours(ref.rad_func.net)}
    import chex

    chex.assert_trees_all_equal_structs(mapped, params)
    got = np.asarray(ours.apply({"params": mapped}, xe, engine, frame))

    def per_l_norms(arr):
        return np.stack(
            [
                np.linalg.norm(arr[:, l * l : (l + 1) * (l + 1), :], axis=1)
                for l in range(LMAX + 1)
            ],
            axis=1,
        )  # [N, L, C]

    np.testing.assert_allclose(
        per_l_norms(got), per_l_norms(want), atol=2e-5, rtol=1e-4
    )


def _install_o3_shims(mod):
    """Real e3nn angle conventions for the stubbed o3 module (needed by
    SO3_Rotation.RotationToWignerDMatrix)."""

    def xyz_to_angles(xyz):
        xyz = torch.nn.functional.normalize(xyz, p=2.0, dim=-1)
        xyz = xyz.clamp(-1, 1)
        beta = torch.acos(xyz[..., 1])
        alpha = torch.atan2(xyz[..., 0], xyz[..., 2])
        return alpha, beta

    def _rot_y(a):
        c, s, o, z = torch.cos(a), torch.sin(a), torch.ones_like(a), torch.zeros_like(a)
        return torch.stack(
            [torch.stack([c, z, s], -1), torch.stack([z, o, z], -1),
             torch.stack([-s, z, c], -1)], -2)

    def _rot_x(a):
        c, s, o, z = torch.cos(a), torch.sin(a), torch.ones_like(a), torch.zeros_like(a)
        return torch.stack(
            [torch.stack([o, z, z], -1), torch.stack([z, c, -s], -1),
             torch.stack([z, s, c], -1)], -2)

    mod.o3.xyz_to_angles = xyz_to_angles
    mod.o3.angles_to_matrix = lambda a, b, g: _rot_y(a) @ _rot_x(b) @ _rot_y(g)
    # per-destination softmax for the stubbed torch_geometric
    utils = types.ModuleType("torch_geometric.utils")

    def _softmax(src, index, num_nodes=None):
        n = int(index.max()) + 1
        shape = (n,) + src.shape[1:]
        idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        mx = torch.full(shape, float("-inf"), dtype=src.dtype).scatter_reduce(
            0, idx, src, reduce="amax", include_self=True
        )
        e = (src - mx[index]).exp()
        dn = torch.zeros(shape, dtype=src.dtype).index_add(0, index, e)
        return e / dn[index].clamp_min(1e-16)

    utils.softmax = _softmax
    mod.pyg.utils = utils
    return mod


def _seeded_reference_gauge(mod, edge_vec_np, lmax):
    """Deterministic reference edge frames: seed torch, run the reference's
    init_edge_rot_mat (random azimuthal gauge, EF_layers.py:2286-2350), build
    its fp64 Wigner matrices, and return (SO3_Rotation, padded blocks for OUR
    rotate). Injecting the reference's own D-matrices removes the gauge
    freedom — both pipelines then rotate with literally the same numbers."""
    from singa_tpu.equivariant import so3

    import jax.numpy as jnp

    torch.manual_seed(1234)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        R = mod.init_edge_rot_mat(_t64(edge_vec_np), device="cpu")
        rot = mod.SO3_Rotation(lmax, device="cpu")
        rot.set_wigner(R)
    finally:
        torch.set_default_dtype(prev)
    wig = rot.wigner.numpy()  # [E, (lmax+1)^2, (lmax+1)^2] fp64
    blocks = []
    for l in range(lmax + 1):
        mm = min(l, MMAX)
        s = l * l
        blocks.append(
            jnp.asarray(wig[:, s + (l - mm) : s + (l + mm) + 1, s : s + 2 * l + 1])
        )
    return rot, so3.pad_wigner_blocks(blocks, lmax, MMAX)


def _attention_param_map(ref):
    """Reference SO2EquivariantGraphAttention params -> our GraphAttention."""
    t = lambda p: p.detach().numpy()
    extra = ref.num_heads * ref.attn_alpha_channels + ref.hidden_channels
    return {
        "so2_conv_1": _so2_weight_map(ref.so2_conv_1, LMAX + 1, extra),
        "so2_conv_2": _so2_weight_map(ref.so2_conv_2, LMAX + 1, 0),
        "alpha_norm": {"scale": t(ref.alpha_norm.weight), "bias": t(ref.alpha_norm.bias)},
        "alpha_dot": t(ref.alpha_dot),
        "proj_w": t(ref.proj.weight),
        "proj_b": t(ref.proj.bias),
    }


def _attention_fixture(seed, n_src=7, n_dst=7):
    """Shared geometry/edge fixture: every destination gets >= 1 edge."""
    from singa_tpu.ops.neighbors import EdgeEngine, build_dst_table

    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    E = 2 * n_dst
    dst = np.concatenate([np.arange(n_dst), rng.integers(0, n_dst, n_dst)])
    src = (dst + rng.integers(1, n_src, E)) % n_src
    pos_src = rng.normal(size=(n_src, 3)) * 3.0
    pos_dst = pos_src if n_src == n_dst else rng.normal(size=(n_dst, 3)) * 3.0
    edge_vec = pos_src[src] - pos_dst[dst]
    idx = np.stack([src, dst], -1)[None]
    mask = np.ones((1, E), bool)
    tbl, kept, dropped = build_dst_table(idx[..., 1], mask, n_dst, 6)
    assert dropped == 0
    engine = EdgeEngine.create(
        jnp.asarray(idx, jnp.int32), jnp.asarray(mask), jnp.asarray(tbl),
        n_src=n_src, n_dst=n_dst,
    )
    return rng, src, dst, edge_vec, engine


def test_so2_graph_attention_matches_reference():
    """The COMPOSED SO2EquivariantGraphAttention block (EF_layers.py:878-1204)
    vs torch fp64 END-TO-END: edge-scalar radial -> expand/concat -> rotate
    (reference's own seeded-gauge Wigner matrices injected on our side) ->
    SO2 conv 1 -> separable S2 activation -> SO2 conv 2 -> per-destination
    alpha softmax -> rotate back -> reduce -> projection. This is the
    composition VERDICT r3 flagged as un-anchored; determinism comes from
    seeding the reference's random azimuthal gauge and feeding our rotate the
    identical D-matrices."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.dtypes import compute_dtype_scope
    from singa_tpu.equivariant.attention import GraphAttention
    from singa_tpu.equivariant.grid import get_grid

    mod = _install_o3_shims(_load_reference_ef_layers())
    torch.manual_seed(11)
    C, H, HEADS, AC, VC, CO, D0 = 6, 10, 2, 4, 3, 6, 9
    rng, src, dst, edge_vec, engine = _attention_fixture(31)
    N = 7
    E = len(src)

    rot, wig_ours = _seeded_reference_gauge(mod, edge_vec, LMAX)
    mappingReduced = mod.CoefficientMappingModule([LMAX], [MMAX], device="cpu")
    grid_t = get_grid(LMAX, MMAX)
    so3_grid = {
        LMAX: {
            MMAX: _GridStub(
                _t64(np.asarray(grid_t.to_grid_mat, np.float64)),
                _t64(np.asarray(grid_t.from_grid_mat, np.float64)),
            )
        }
    }
    ref = mod.SO2EquivariantGraphAttention(
        sphere_channels=C, hidden_channels=H, num_heads=HEADS,
        attn_alpha_channels=AC, attn_value_channels=VC, output_channels=CO,
        lmax_list=[LMAX], mmax_list=[MMAX], SO3_rotation=[rot],
        mappingReduced=mappingReduced, SO3_grid=so3_grid,
        max_num_elements=16, edge_channels_list=[D0, 16, 16],
        use_atom_edge_embedding=False, device="cpu",
    ).double().eval()

    x_np = rng.normal(size=(N, (LMAX + 1) ** 2, C))
    xe_np = rng.normal(size=(E, D0))
    x_ref = mod.SO3_Embedding(N, [LMAX], C, device="cpu", dtype=torch.float64)
    x_ref.set_embedding(_t64(x_np))
    with torch.no_grad():
        want = ref(
            x_ref,
            torch.zeros(N, dtype=torch.long),
            _t64(xe_np),
            torch.tensor(np.stack([src, dst])),
            hetero=False,
        ).embedding.numpy()

    ours = GraphAttention(
        sphere_channels=C, hidden_channels=H, num_heads=HEADS,
        attn_alpha_channels=AC, attn_value_channels=VC, output_channels=CO,
        lmax=LMAX, mmax=MMAX, edge_channels=(16, 16),
    )
    with compute_dtype_scope(jnp.float64):
        x_j = jnp.asarray(x_np)
        xe_j = jnp.asarray(xe_np)
        params = ours.init(jax.random.PRNGKey(0), x_j, x_j, xe_j, engine, wig_ours)[
            "params"
        ]
        mapped = _attention_param_map(ref)
        import chex

        chex.assert_trees_all_equal_structs(mapped, params)
        got = ours.apply({"params": mapped}, x_j, x_j, xe_j, engine, wig_ours)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


@pytest.mark.parametrize("hetero", [False, True])
def test_transblock_v2_matches_reference(hetero):
    """The COMPOSED TransBlockV2 (EF_layers.py:1207-1410): pre-norm ->
    attention -> residual -> pre-norm -> FFN -> residual, homogeneous AND
    heterogeneous (dict-x) paths, torch fp64, seeded reference gauge."""
    import jax
    import jax.numpy as jnp

    from singa_tpu.dtypes import compute_dtype_scope
    from singa_tpu.equivariant.attention import TransBlock
    from singa_tpu.equivariant.grid import get_grid

    mod = _install_o3_shims(_load_reference_ef_layers())
    torch.manual_seed(13)
    C, H, HEADS, AC, VC, FH, D0 = 6, 10, 2, 4, 3, 14, 9
    n_src = 7
    rng, src, dst, edge_vec, engine = _attention_fixture(37, n_src=n_src, n_dst=7)
    N = 7
    E = len(src)

    rot, wig_ours = _seeded_reference_gauge(mod, edge_vec, LMAX)
    mappingReduced = mod.CoefficientMappingModule([LMAX], [MMAX], device="cpu")
    grid_t = get_grid(LMAX, MMAX)
    grid_f = get_grid(LMAX, LMAX)
    as_stub = lambda g: _GridStub(
        _t64(np.asarray(g.to_grid_mat, np.float64)),
        _t64(np.asarray(g.from_grid_mat, np.float64)),
    )
    so3_grid = {LMAX: {MMAX: as_stub(grid_t), LMAX: as_stub(grid_f)}}

    ref = mod.TransBlockV2(
        sphere_channels=C, attn_hidden_channels=H, attn_alpha_channels=AC,
        attn_value_channels=VC, ffn_hidden_channels=FH, output_channels=C,
        edge_channels_list=[D0, 16, 16], lmax_list=[LMAX], mmax_list=[MMAX],
        SO3_rotation=[rot], mappingReduced=mappingReduced, SO3_grid=so3_grid,
        num_heads=HEADS, max_num_elements=16, use_atom_edge_embedding=False,
        device="cpu",
    ).double().eval()
    # the reference creates balance_degree_weight in float32 (rounded before
    # .double()); replace with exact values so the comparison measures the
    # computation (same approach as test_equivariant_norms_match_reference)
    l_of = np.asarray([l for l in range(LMAX + 1) for _ in range(2 * l + 1)])
    exact = (1.0 / ((2.0 * l_of + 1.0) * (LMAX + 1)))[:, None]
    with torch.no_grad():
        ref.norm_1.balance_degree_weight.copy_(_t64(exact))
        ref.norm_2.balance_degree_weight.copy_(_t64(exact))

    x_dst_np = rng.normal(size=(N, (LMAX + 1) ** 2, C))
    x_src_np = rng.normal(size=(n_src, (LMAX + 1) ** 2, C)) if hetero else x_dst_np
    xe_np = rng.normal(size=(E, D0))
    edge_index = torch.tensor(np.stack([src, dst]))

    with torch.no_grad():
        if hetero:
            xs = mod.SO3_Embedding(n_src, [LMAX], C, device="cpu", dtype=torch.float64)
            xs.set_embedding(_t64(x_src_np))
            xt = mod.SO3_Embedding(N, [LMAX], C, device="cpu", dtype=torch.float64)
            xt.set_embedding(_t64(x_dst_np))
            want = ref(
                {"l": xs, "p": xt},
                {"l": torch.zeros(n_src, dtype=torch.long),
                 "p": torch.zeros(N, dtype=torch.long)},
                _t64(xe_np), edge_index, batch=None, hetero=True,
                source_target=("l", "p"),
            ).embedding.numpy()
        else:
            x_ref = mod.SO3_Embedding(N, [LMAX], C, device="cpu", dtype=torch.float64)
            x_ref.set_embedding(_t64(x_dst_np))
            want = ref(
                x_ref, torch.zeros(N, dtype=torch.long), _t64(xe_np),
                edge_index, batch=None, hetero=False,
            ).embedding.numpy()

    ours = TransBlock(
        sphere_channels=C, attn_hidden_channels=H, attn_alpha_channels=AC,
        attn_value_channels=VC, ffn_hidden_channels=FH, num_heads=HEADS,
        lmax=LMAX, mmax=MMAX, edge_channels=(16, 16),
    )
    t = lambda p: p.detach().numpy()
    rms = lambda n: {"weight": t(n.affine_weight), "bias": t(n.affine_bias)}
    mapped = {
        "EquivariantRMSNorm_0": rms(ref.norm_1),
        "EquivariantRMSNorm_1": rms(ref.norm_2),
        "ga": _attention_param_map(ref.ga),
        "ffn": {
            "w1": t(ref.ffn.so3_linear_1.weight),
            "b1": t(ref.ffn.so3_linear_1.bias),
            "w2": t(ref.ffn.so3_linear_2.weight),
            "b2": t(ref.ffn.so3_linear_2.bias),
            "gate_kernel": t(ref.ffn.gating_linear.weight).T,
            "gate_bias": t(ref.ffn.gating_linear.bias),
        },
    }
    with compute_dtype_scope(jnp.float64):
        xs_j = jnp.asarray(x_src_np)
        xt_j = jnp.asarray(x_dst_np)
        xe_j = jnp.asarray(xe_np)
        params = ours.init(
            jax.random.PRNGKey(0), xs_j, xt_j, xe_j, engine, wig_ours
        )["params"]
        import chex

        chex.assert_trees_all_equal_structs(mapped, params)
        got = ours.apply({"params": mapped}, xs_j, xt_j, xe_j, engine, wig_ours)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_cpromg_encoder_matches_reference_on_7cff():
    """Full pocket-encoder chain vs the torch reference (CProMG.py:276-309)
    on REAL 7cff pocket coordinates/features from our ETL: kNN graph ->
    undirected mean lengths -> Gaussian smearing (stop=15) -> Laplacian edge
    transform -> [attention + FFN] x L, with real torch implementations
    injected for the absent PyG ops (knn_graph / to_undirected /
    get_laplacian / to_dense_batch). fp64 both sides."""
    import types as _t

    import jax
    import jax.numpy as jnp

    from singa_tpu.dtypes import compute_dtype_scope
    from singa_tpu.models.cpromg import EncoderLayer, _build_graph

    mod = _install_cpromg_ops(_load_reference_cpromg())

    z = np.load("data/ref_graphs_large/train/7cff.npz")
    valid = z["protein.mask"].astype(bool)
    N, K_NN, L = 96, 16, 2
    feat = z["protein.x"][valid][:N].astype(np.float64)
    pos = z["protein.pos"][valid][:N].astype(np.float64)
    lap = z["protein.lap_pe"][valid][:N].astype(np.float64)

    torch.manual_seed(11)
    C, KC, H, De = 64, 32, 4, 16
    ref_cfg = _t.SimpleNamespace(
        hidden_channels=C, key_channels=KC, num_heads=H, edge_channels=De,
        knn=K_NN, lap_dim=lap.shape[1], num_interactions=L,
    )
    ref = mod.Encoder(ref_cfg, protein_atom_feature_dim=feat.shape[1],
                      device="cpu").double().eval()
    with torch.no_grad():
        enc_ref, pad_ref, msas_ref = ref(
            torch.tensor(feat), torch.tensor(pos),
            torch.zeros(N, dtype=torch.long), torch.tensor(lap),
        )
    enc_ref = enc_ref[0].numpy()

    # ---- ours: same weights, our static-shape graph chain ----
    def lin(tmod, x):
        return x @ tmod.weight.detach().numpy().T + tmod.bias.detach().numpy()

    def grouped_from(tconv, h):
        w = tconv.weight.detach().numpy()[:, :, 0]
        out_pg = w.shape[0] // h
        return {"weight": w.reshape(h, out_pg, w.shape[1]).transpose(0, 2, 1)}

    def mlp_from(tseq):
        return {"Linear_0": _lin_from(tseq[0]), "Linear_1": _lin_from(tseq[2])}

    def mha_from(tmod):
        return {
            "k_lin": grouped_from(tmod.k_lin, H),
            "q_lin": grouped_from(tmod.q_lin, H),
            "v_lin": grouped_from(tmod.v_lin, H),
            "weight_k_net": mlp_from(tmod.weight_k_net),
            "weight_k_lin": _lin_from(tmod.weight_k_lin),
            "weight_v_net": mlp_from(tmod.weight_v_net),
            "weight_v_lin": _lin_from(tmod.weight_v_lin),
            "centroid_lin": _lin_from(tmod.centroid_lin),
            "out_transform": _lin_from(tmod.out_transform),
            "layer_norm": _ln_from(tmod.layer_norm),
        }

    x = lin(ref.protein_atom_emb, feat) + lin(ref.laplacian_emb, lap)
    with compute_dtype_scope(jnp.float64):
        edges, attr = _build_graph(
            jnp.asarray(pos)[None], jnp.ones((1, N), bool), K_NN, 15.0, De
        )
        x = jnp.asarray(x)
        cfg = _t.SimpleNamespace(
            hidden_channels=C, key_channels=KC, num_heads=H, ffn_hidden=1024
        )
        from singa_tpu.config import EncoderConfig

        ecfg = EncoderConfig(
            hidden_channels=C, edge_channels=De, key_channels=KC,
            num_heads=H, num_interactions=L, knn=K_NN,
        )
        for i, tlayer in enumerate(ref.layers):
            layer = EncoderLayer(ecfg)
            params = {
                "enc_self_attn": mha_from(tlayer.enc_self_attn),
                "pos_ffn": {
                    "conv1": _conv1_from(tlayer.pos_ffn.conv1),
                    "conv2": _conv1_from(tlayer.pos_ffn.conv2),
                    "layer_norm": _ln_from(tlayer.pos_ffn.layer_norm),
                },
            }
            params = jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float64), params
            )
            msa, x = layer.apply({"params": params}, x, edges, attr.astype(jnp.float64))
            np.testing.assert_allclose(
                np.asarray(msa), msas_ref[i][0].numpy(), atol=1e-7,
                err_msg=f"msa layer {i}",
            )
    np.testing.assert_allclose(np.asarray(x), enc_ref, atol=1e-7)


def test_cpromg_encoder2_matches_reference():
    """Second (cross-attention) encoder vs the torch reference
    (CProMG.py:313-343): 6 layers with dense cross-attention into the atom
    MSA outputs at layers 2 and 5, driven by our whole Encoder2 module with
    copied weights. fp64."""
    import types as _t

    import chex
    import jax
    import jax.numpy as jnp

    from singa_tpu.config import EncoderConfig
    from singa_tpu.dtypes import compute_dtype_scope
    from singa_tpu.models.cpromg import Encoder2

    mod = _install_cpromg_ops(_load_reference_cpromg())

    torch.manual_seed(13)
    rng = np.random.default_rng(13)
    N, S, L = 40, 24, 6
    C, KC, H, De = 64, 32, 4, 16
    F_IN = 32

    feat = rng.normal(size=(N, F_IN))
    pos = rng.normal(size=(N, 3)) * 6.0
    lap = rng.normal(size=(N, 8))
    msas = [rng.normal(size=(1, S, C)) for _ in range(L)]
    atom_pad = np.zeros((1, 1, S), bool)
    atom_pad[:, :, -3:] = True

    ref_cfg = _t.SimpleNamespace(
        hidden_channels=C, key_channels=KC, num_heads=H, edge_channels=De,
        knn=30, lap_dim=8, num_interactions=L,
    )
    ref = mod.Encoder2(ref_cfg, aa_feature_dim=F_IN, device="cpu").double().eval()
    with torch.no_grad():
        want, _ = ref(
            torch.tensor(feat), torch.tensor(pos),
            torch.zeros(N, dtype=torch.long), torch.tensor(lap),
            torch.tensor(atom_pad),
            [torch.tensor(m) for m in msas],
        )
    want = want[0].numpy()

    def grouped_from(tconv):
        # DenseGraphMHA holds the grouped projection as a bare array param
        w = tconv.weight.detach().numpy()[:, :, 0]
        out_pg = w.shape[0] // H
        return w.reshape(H, out_pg, w.shape[1]).transpose(0, 2, 1)

    def mlp_from(tseq):
        return {"Linear_0": _lin_from(tseq[0]), "Linear_1": _lin_from(tseq[2])}

    ecfg = EncoderConfig(
        hidden_channels=C, edge_channels=De, key_channels=KC, num_heads=H,
        num_interactions=L, knn=30, knn_aa=30,
    )
    ours = Encoder2(ecfg, feature_dim=F_IN)
    with compute_dtype_scope(jnp.float64):
        args = (
            jnp.asarray(feat)[None], jnp.asarray(pos)[None],
            jnp.ones((1, N), bool), jnp.asarray(lap)[None],
            jnp.asarray(atom_pad), [jnp.asarray(m) for m in msas],
        )
        params = ours.init(jax.random.PRNGKey(0), *args)["params"]
        mapped = {
            "aa_emb": _lin_from(ref.aa_emb),
            "laplacian_emb": _lin_from(ref.laplacian_emb),
        }
        for i, tl in enumerate(ref.layers):
            a = tl.enc_self_attn
            mapped[f"layer_{i}_attn"] = {
                "q_lin": grouped_from(a.q_lin),
                "k_lin": grouped_from(a.k_lin),
                "v_lin": grouped_from(a.v_lin),
                "weight_k_net": mlp_from(a.weight_k_net),
                "weight_k_lin_kernel": a.weight_k_lin.weight.detach().numpy().T,
                "weight_v_net": mlp_from(a.weight_v_net),
                "weight_v_lin": _lin_from(a.weight_v_lin),
                "centroid_lin": _lin_from(a.centroid_lin),
                "out_transform": _lin_from(a.out_transform),
                "layer_norm": _ln_from(a.layer_norm),
            }
            mapped[f"layer_{i}_ffn"] = {
                "conv1": _conv1_from(tl.pos_ffn.conv1),
                "conv2": _conv1_from(tl.pos_ffn.conv2),
                "layer_norm": _ln_from(tl.pos_ffn.layer_norm),
            }
            if i in (2, 5):
                mapped[f"layer_{i}_proj"] = _lin_from(tl.proj)
                x2 = tl.cross_attn
                mapped[f"layer_{i}_cross"] = {
                    "W_Q": _lin_from(x2.W_Q), "W_K": _lin_from(x2.W_K),
                    "W_V": _lin_from(x2.W_V), "linear": _lin_from(x2.linear),
                    "layer_norm": _ln_from(x2.layer_norm),
                }
            mapped[f"layer_{i}_norm"] = (
                _ln_from(tl.layer_norm) if i in (2, 5) else None
            )
        mapped = {k: v for k, v in mapped.items() if v is not None}
        mapped = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), mapped)
        chex.assert_trees_all_equal_structs(mapped, params)
        got, _ = ours.apply({"params": mapped}, *args)
    # the reference's weight_k_lin bias is dropped in our folded form
    # (softmax-invariant), so agreement is exact
    np.testing.assert_allclose(np.asarray(got)[0], want, atol=1e-7)


def test_cpromg_full_transformer_matches_reference_on_7cff():
    """The COMPLETE CProMG module vs torch (Transformer, CProMG.py:426-464):
    pocket encoder (real 7cff features/positions/lap-PE) + second encoder
    with cross-attention + property-prefixed decoder on the real 7cff token
    sequence + bias-free vocab projection + prop-position strip. fp64; our
    encoders run the dense attention form (parameter-compatible with the
    segment/neighbor forms, which are parity-tested against it)."""
    import dataclasses
    import types as _t

    import chex
    import jax
    import jax.numpy as jnp

    from singa_tpu.config import (
        DecoderConfig,
        EncoderConfig,
        ModelConfig,
        SMI_VOCAB,
    )
    from singa_tpu.dtypes import compute_dtype_scope
    from singa_tpu.models.cpromg import CProMGTransformer

    mod = _install_cpromg_ops(_load_reference_cpromg())
    torch.manual_seed(17)
    rng = np.random.default_rng(17)

    z = np.load("data/ref_graphs_large/train/7cff.npz")
    valid = z["protein.mask"].astype(bool)
    N, N2, L, T = 72, 20, 6, 48
    C, KC, H, De, K_NN = 64, 32, 4, 16, 12
    P = 3
    feat = z["protein.x"][valid][:N].astype(np.float64)
    pos = z["protein.pos"][valid][:N].astype(np.float64)
    lap = z["protein.lap_pe"][valid][:N].astype(np.float64)
    F_IN = feat.shape[1]
    tokens_np = z["tokens.input"][:T][None].astype(np.int64)
    prop_np = np.array(
        [[float(z["props.vina"]) < -7.5, float(z["props.qed"]) > 0.6,
          float(z["props.sas"]) < 4.0]], np.float64
    )
    feat2 = rng.normal(size=(N2, F_IN))
    pos2 = rng.normal(size=(N2, 3)) * 5.0
    lap2 = rng.normal(size=(N2, 8))

    enc_cfg = _t.SimpleNamespace(
        hidden_channels=C, key_channels=KC, num_heads=H, edge_channels=De,
        knn=K_NN, lap_dim=8, num_interactions=L,
    )
    dec_cfg = _t.SimpleNamespace(
        hidden_channels=C, key_channels=KC, num_heads=H,
        num_interactions=2, smiVoc=list(SMI_VOCAB),
    )
    full_cfg = _t.SimpleNamespace(
        encoder=enc_cfg, decoder=dec_cfg, hidden_channels=C
    )
    # reference Encoder2 hardcodes knn 30 > N2: cap via a monkeypatchable knn
    ref = mod.Transformer(
        full_cfg, protein_atom_feature_dim=F_IN, num_props=P, device="cpu"
    ).double().eval()
    with torch.no_grad():
        want = ref(
            torch.tensor(feat), torch.tensor(pos),
            torch.zeros(N, dtype=torch.long), torch.tensor(lap),
            torch.tensor(tokens_np), T,
            torch.tensor(feat2), torch.tensor(pos2),
            torch.zeros(N2, dtype=torch.long), torch.tensor(lap2),
            prop=torch.tensor(prop_np),
        ).numpy().reshape(1, T, -1)

    ecfg = EncoderConfig(
        hidden_channels=C, edge_channels=De, key_channels=KC, num_heads=H,
        num_interactions=L, knn=K_NN, knn_aa=min(30, N2 - 1),
        attn_form="dense", remat="off",
    )
    dcfg = DecoderConfig(
        tgt_len=T, hidden_channels=C, key_channels=KC, num_heads=H,
        num_interactions=2, ffn_hidden=1024, vocab_size=len(SMI_VOCAB),
    )
    mcfg = ModelConfig(
        featurizer_feat_dim=F_IN, hidden_channels=C,
        encoder=ecfg, decoder=dcfg, num_props=P,
    )
    pad = SMI_VOCAB.index("^")
    ours = CProMGTransformer(mcfg, pad_token=pad)

    args = (
        jnp.asarray(feat)[None], jnp.asarray(pos)[None],
        jnp.ones((1, N), bool), jnp.asarray(lap)[None],
        jnp.asarray(tokens_np, jnp.int32),
        jnp.asarray(feat2)[None], jnp.asarray(pos2)[None],
        jnp.ones((1, N2), bool), jnp.asarray(lap2)[None],
        jnp.asarray(prop_np),
    )
    with compute_dtype_scope(jnp.float64):
        params = ours.init(jax.random.PRNGKey(0), *args)["params"]

    def grouped_arr(tconv):
        w = tconv.weight.detach().numpy()[:, :, 0]
        out_pg = w.shape[0] // H
        return w.reshape(H, out_pg, w.shape[1]).transpose(0, 2, 1)

    def mlp_from(tseq):
        return {"Linear_0": _lin_from(tseq[0]), "Linear_1": _lin_from(tseq[2])}

    def dense_attn_from(a):
        return {
            "q_lin": grouped_arr(a.q_lin),
            "k_lin": grouped_arr(a.k_lin),
            "v_lin": grouped_arr(a.v_lin),
            "weight_k_net": mlp_from(a.weight_k_net),
            "weight_k_lin_kernel": a.weight_k_lin.weight.detach().numpy().T,
            "weight_v_net": mlp_from(a.weight_v_net),
            "weight_v_lin": _lin_from(a.weight_v_lin),
            "centroid_lin": _lin_from(a.centroid_lin),
            "out_transform": _lin_from(a.out_transform),
            "layer_norm": _ln_from(a.layer_norm),
        }

    def ffn_from(f):
        return {
            "conv1": _conv1_from(f.conv1),
            "conv2": _conv1_from(f.conv2),
            "layer_norm": _ln_from(f.layer_norm),
        }

    # encoder 1: scanned layers -> stack along axis 0
    stacked = {}
    per_layer = [
        {"enc_self_attn": dense_attn_from(tl.enc_self_attn),
         "pos_ffn": ffn_from(tl.pos_ffn)}
        for tl in ref.encoder.layers
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per_layer)
    enc1_params = {
        "protein_atom_emb": _lin_from(ref.encoder.protein_atom_emb),
        "laplacian_emb": _lin_from(ref.encoder.laplacian_emb),
        "layers": {"layer": stacked},
    }
    enc2_params = {
        "aa_emb": _lin_from(ref.encoder2.aa_emb),
        "laplacian_emb": _lin_from(ref.encoder2.laplacian_emb),
    }
    for i, tl in enumerate(ref.encoder2.layers):
        enc2_params[f"layer_{i}_attn"] = dense_attn_from(tl.enc_self_attn)
        enc2_params[f"layer_{i}_ffn"] = ffn_from(tl.pos_ffn)
        if i in (2, 5):
            enc2_params[f"layer_{i}_proj"] = _lin_from(tl.proj)
            x2 = tl.cross_attn
            enc2_params[f"layer_{i}_cross"] = {
                "W_Q": _lin_from(x2.W_Q), "W_K": _lin_from(x2.W_K),
                "W_V": _lin_from(x2.W_V), "linear": _lin_from(x2.linear),
                "layer_norm": _ln_from(x2.layer_norm),
            }
            enc2_params[f"layer_{i}_norm"] = _ln_from(tl.layer_norm)
    dec_params = {
        "mol_emb": {"embedding": ref.decoder.mol_emb.weight.detach().numpy()},
        "type_emb": {"embedding": ref.decoder.type_emb.weight.detach().numpy()},
        "prop_nn": _lin_from(ref.decoder.prop_nn),
    }
    for i, tl in enumerate(ref.decoder.layers):
        dec_params[f"layer_{i}"] = {
            "dec_self_attn": _mha_from(tl.dec_self_attn),
            "dec_enc_attn": _mha_from(tl.dec_enc_attn),
            "pos_ffn": ffn_from(tl.pos_ffn),
        }
    mapped = {
        "encoder": enc1_params,
        "encoder2": enc2_params,
        "decoder": dec_params,
        "projection": {
            "Dense_0": {"kernel": ref.projection.weight.detach().numpy().T}
        },
    }
    mapped = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), mapped)
    chex.assert_trees_all_equal_structs(mapped, params)
    with compute_dtype_scope(jnp.float64):
        got = ours.apply({"params": mapped}, *args)
    # 1e-6: fp64 association noise through the 14-layer composition
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
