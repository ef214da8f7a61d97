"""Equivariant building blocks: SO3 linear, SO2 convolutions, S2/gate
activations, equivariant norms, radial MLPs.

TPU-native re-design of the reference layer library
(/root/reference/model/EF_layers.py). Features are plain arrays
``[N, coeffs, C]``; all coefficient bookkeeping comes from
singa_tpu/equivariant/so3.py as static indices. Initialisers follow torch
defaults (uniform +-1/sqrt(fan_in) for linears, N(0,1) for embeddings) so the
training dynamics land in the same regime as the reference.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.dtypes import compute_dtype
from singa_tpu.equivariant.grid import get_grid
from singa_tpu.equivariant.so3 import CoefficientMapping


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # flax Dense kernel shape is [fan_in, fan_out]
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """nn.Dense with torch-default initialisation."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=compute_dtype(),
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
        )(x)


class Embed(nn.Module):
    """nn.Embed with torch-default N(0,1) initialisation."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, idx):
        return nn.Embed(
            self.num_embeddings,
            self.features,
            dtype=compute_dtype(),
            embedding_init=nn.initializers.normal(stddev=1.0),
        )(idx)


def smooth_leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """Reference EF_layers.py:1669-1677."""
    a = negative_slope
    return ((1 + a) / 2.0) * x + ((1 - a) / 2.0) * x * (2.0 * jax.nn.sigmoid(x) - 1.0)


class RadialMLP(nn.Module):
    """Linear -> LayerNorm -> SiLU stack; last layer plain Linear.

    Reference RadialFunction (EF_layers.py:1634-1657).
    """

    channels: Sequence[int]  # hidden + output sizes (input inferred)

    @nn.compact
    def __call__(self, x):
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            x = Linear(ch)(x)
            if i < n - 1:
                # epsilon: torch nn.LayerNorm default (1e-5); flax defaults
                # to 1e-6, which broke fp64 parity with the reference
                x = nn.LayerNorm(epsilon=1e-5)(x)
                x = jax.nn.silu(x)
        return x


def per_degree_linear(x: jax.Array, w: jax.Array, sizes) -> jax.Array:
    """Per-degree channel mix: x [N, sum(sizes), Cin] with contiguous l-blocks
    of the given sizes, w [L, F, Cin] -> [N, sum(sizes), F].

    One [N*size_l, Cin] @ [Cin, F] matmul per degree (large M) instead of the
    einsum against a [coeffs, F, Cin] gather-expanded weight, which XLA ran
    as `coeffs` tiny batched matmuls (~10 ms per call site in the round-2
    step profile)."""
    N = x.shape[0]
    c_in = x.shape[-1]
    outs = []
    off = 0
    for l, sz in enumerate(sizes):
        seg = jax.lax.slice_in_dim(x, off, off + sz, axis=1)
        y = seg.reshape(N * sz, c_in) @ w[l].T
        outs.append(y.reshape(N, sz, -1))
        off += sz
    return jnp.concatenate(outs, axis=1)


def add_l0(x: jax.Array, bias: jax.Array) -> jax.Array:
    """Add a per-channel bias to the l=0 (first) coefficient row.

    ``x.at[:, 0, :].add(bias)`` lowers to an HLO scatter-add that cost
    ~7.5 ms per call site in the round-2 profile; a broadcast multiply with a
    constant one-hot row fuses into neighbouring elementwise work instead.
    """
    e0 = jnp.asarray(np.eye(x.shape[1], 1, dtype=np.float32), x.dtype)
    return x + e0 * bias.astype(x.dtype)[None, None, :]


class SO3Linear(nn.Module):
    """Per-degree linear map with bias on the l=0 scalars.

    Reference SO3_LinearV2 (EF_layers.py:624-671): weight ``[lmax+1, out, in]``
    expanded over m via gather; implemented as a single einsum with a static
    per-coefficient degree index.
    """

    features: int
    lmax: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        bound = 1.0 / np.sqrt(c_in)
        weight = self.param(
            "weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.lmax + 1, self.features, c_in),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = compute_dtype()
        # NOTE: an l-grouped 7-matmul variant (per_degree_linear) was tried in
        # round 2 and was ~2.4x SLOWER end-to-end: its 7-piece concatenate of
        # [N, 2l+1, F] blocks re-tiles every odd-sublane piece (~28 ms per
        # call site). The gather-expanded einsum stays.
        l_of = CoefficientMapping(self.lmax, self.lmax).l_of_full
        w = jnp.take(weight.astype(dt), l_of, axis=0)  # [coeffs, out, in]
        out = jnp.einsum("nic,ioc->nio", x.astype(dt), w)
        return add_l0(out, bias)


class EquivariantRMSNorm(nn.Module):
    """'rms_norm_sh' — EquivariantRMSNormArraySphericalHarmonicsV2
    (EF_layers.py:2099-2192): centred l=0, degree-balanced component RMS,
    per-degree affine weight, l=0 bias.
    """

    lmax: int
    eps: float = 1e-5
    centering: bool = True
    std_balance_degrees: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dtype = x.dtype
        # f32 statistics under mixed precision; keeps f64 when given f64
        # (the torch-parity tests run the norms in double)
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        N, I, C = x.shape
        weight = self.param("weight", nn.initializers.ones, (self.lmax + 1, C))
        bias = self.param("bias", nn.initializers.zeros, (C,)) if self.centering else None

        # FLAT [N, I*C] layout throughout: at C=16 the [N, I, C] form pays 8x
        # lane under-utilisation on every elementwise op, and its backward
        # reduce_sums were ~9 ms/step in the round-3 batch-32 profile.
        x2 = x.reshape(N, I * C)
        if self.centering:
            mean0 = jnp.mean(x2[:, :C], axis=-1, keepdims=True)  # [N, 1]
            e0 = jnp.asarray(
                np.concatenate([np.ones(C), np.zeros((I - 1) * C)]).astype(np.float32),
                x2.dtype,
            )
            x2 = x2 - mean0 * e0[None, :]

        mapping = CoefficientMapping(self.lmax, self.lmax)
        if self.std_balance_degrees:
            bal = 1.0 / ((2.0 * mapping.l_of_full + 1.0) * (self.lmax + 1) * C)
            balv = np.repeat(np.asarray(bal), C)  # [I*C]
        else:
            balv = np.full(I * C, 1.0 / (I * C))
        norm = (x2 * x2) @ jnp.asarray(balv, x2.dtype)  # [N]
        inv = jax.lax.rsqrt(norm + self.eps)[:, None]

        wv = jnp.take(weight.astype(x2.dtype), mapping.l_of_full, axis=0)  # [I, C]
        out = x2 * inv * wv.reshape(1, I * C)
        if self.centering:
            bflat = jnp.concatenate(
                [bias.astype(out.dtype), jnp.zeros((I - 1) * C, out.dtype)]
            )
            out = out + bflat[None, :]
        return out.reshape(N, I, C).astype(in_dtype)


class EquivariantLayerNorm(nn.Module):
    """'layer_norm' — EquivariantLayerNormArray (EF_layers.py:1861-1932):
    per-degree norm, scalars centred across channels."""

    lmax: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (self.lmax + 1, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        outs = []
        for l in range(self.lmax + 1):
            s = l * l
            feat = jax.lax.slice_in_dim(x, s, s + 2 * l + 1, axis=1)
            if l == 0:
                feat = feat - jnp.mean(feat, axis=2, keepdims=True)
            norm = jnp.mean(feat * feat, axis=1, keepdims=True)
            norm = jnp.mean(norm, axis=2, keepdims=True)
            inv = (norm + self.eps) ** -0.5 * weight[l].astype(x.dtype)
            feat = feat * inv
            if l == 0:
                feat = feat + bias.astype(x.dtype)
            outs.append(feat)
        return jnp.concatenate(outs, axis=1)


class EquivariantLayerNormSH(nn.Module):
    """'layer_norm_sh' — EquivariantLayerNormArraySphericalHarmonics
    (EF_layers.py:1935-2030): LayerNorm on l=0, one degree-balanced scale for
    all l>0 with per-degree affine weight."""

    lmax: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dtype = x.dtype
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        C = x.shape[-1]
        out0 = nn.LayerNorm(epsilon=self.eps, name="norm_l0")(x[:, :1, :])
        if self.lmax == 0:
            return out0.astype(in_dtype)
        weight = self.param("weight", nn.initializers.ones, (self.lmax, C))
        vec = x[:, 1:, :]
        bal = np.concatenate(
            [np.full(2 * l + 1, 1.0 / ((2 * l + 1) * self.lmax)) for l in range(1, self.lmax + 1)]
        )
        norm = jnp.einsum("nic,i->nc", vec * vec, jnp.asarray(bal, x.dtype))
        norm = jnp.mean(norm, axis=-1)[:, None, None]
        inv = jax.lax.rsqrt(norm + self.eps)
        l_of = np.concatenate(
            [np.full(2 * l + 1, l - 1, np.int32) for l in range(1, self.lmax + 1)]
        )
        w = jnp.take(weight, l_of, axis=0)
        out = jnp.concatenate([out0, vec * inv * w[None]], axis=1)
        return out.astype(in_dtype)


def get_norm_layer(norm_type: str, lmax: int) -> nn.Module:
    if norm_type == "rms_norm_sh":
        return EquivariantRMSNorm(lmax=lmax)
    if norm_type == "layer_norm":
        return EquivariantLayerNorm(lmax=lmax)
    if norm_type == "layer_norm_sh":
        return EquivariantLayerNormSH(lmax=lmax)
    raise ValueError(norm_type)


class GraphDropPath(nn.Module):
    """Per-graph stochastic depth (EF_layers.py:1568-1591): drops whole
    residual branches for random graphs in the batch."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, graph_ids: jax.Array, num_graphs: int, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, (num_graphs,))
        scale = keep.astype(x.dtype) / (1.0 - self.rate)
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        return x * scale[graph_ids].reshape(shape)


class EquivariantDropout(nn.Module):
    """Channel-wise dropout shared across coefficients of a feature
    (EF_layers.py:1597-1628) — preserves equivariance by dropping whole
    channels, never individual m components."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(
            rng, 1.0 - self.rate, (x.shape[0], 1, x.shape[2])
        )
        return x * keep.astype(x.dtype) / (1.0 - self.rate)


def gate_activation(
    gating_scalars: jax.Array, x: jax.Array, lmax: int, mmax: int
) -> jax.Array:
    """Reference GateActivation (EF_layers.py:1683-1733). Parameter-free.

    The wide [N, coeffs-1, C] intermediates are checkpoint-tagged "s2_grid"
    so the save-except remat policies recompute them: untagged they are
    saved residuals (~670 MB each at flagship gate-FFN shapes — the batch-32
    gate recipe OOM'd by 6 GB before the tags)."""
    from jax.ad_checkpoint import checkpoint_name

    C = x.shape[-1]
    gates = jax.nn.sigmoid(gating_scalars).reshape(x.shape[0], lmax, C)
    expand = []
    for l in range(1, lmax + 1):
        n_m = min(2 * l + 1, 2 * mmax + 1)
        expand.extend([l - 1] * n_m)
    gates = checkpoint_name(
        jnp.take(gates, np.asarray(expand, np.int32), axis=1), "s2_grid"
    )
    scalars = jax.nn.silu(x[:, :1, :])
    vectors = checkpoint_name(x[:, 1:, :] * gates, "s2_grid")
    return jnp.concatenate([scalars, vectors], axis=1)


def _use_pallas() -> bool:
    """Fused Pallas kernels are the DEFAULT on TPU (opt out with
    SINGA_TPU_NO_PALLAS=1); XLA everywhere else. The [N, G, C] grid tensors
    are ~GBs at flagship shapes and the XLA einsum pair streams them through
    HBM — 40%+ of the round-2 step profile."""
    import os

    return jax.default_backend() == "tpu" and not os.environ.get(
        "SINGA_TPU_NO_PALLAS"
    )


@functools.lru_cache(maxsize=None)
def _grid_mats_for(lmax: int, mmax: int, m_primary: bool):
    """(to_grid, from_grid) matrices, with the m-primary coefficient
    permutation folded into the constants when requested (free at runtime)."""
    grid = get_grid(lmax, mmax)
    tg, fg = grid.to_grid_mat, grid.from_grid_mat
    if m_primary:
        perm = CoefficientMapping(lmax, mmax).l_to_m
        tg, fg = tg[:, :, perm], fg[:, :, perm]
    return tg, fg


def s2_activation(
    x: jax.Array, lmax: int, mmax: int, m_primary: bool = False
) -> jax.Array:
    """Pointwise SiLU on the sphere grid (EF_layers.py:1736-1754)."""
    tg, fg = _grid_mats_for(lmax, mmax, m_primary)
    if _use_pallas():
        from singa_tpu.ops.pallas.s2_act import s2_silu

        return s2_silu(x, tg, fg)
    # tag the [N, G, C] grid tensors so remat policies can exclude exactly
    # them (they are ~10x the size of any other residual in the block)
    from jax.ad_checkpoint import checkpoint_name

    g = checkpoint_name(
        jnp.einsum("bai,nic->nbac", jnp.asarray(tg, x.dtype), x), "s2_grid"
    )
    h = checkpoint_name(jax.nn.silu(g), "s2_grid")
    return jnp.einsum("bai,nbac->nic", jnp.asarray(fg, x.dtype), h)


def separable_s2_activation(
    scalars: jax.Array, x: jax.Array, lmax: int, mmax: int, m_primary: bool = False
) -> jax.Array:
    """SiLU on explicit scalars + S2 SiLU on the tensor part, recombined
    (EF_layers.py:1757-1773). Coefficient row 0 is (l=0, m=0) in BOTH the
    l-primary and m-primary truncated layouts, so the separable recombine is
    layout-independent."""
    if _use_pallas():
        from singa_tpu.ops.pallas.s2_act import s2_silu_sep

        tg, fg = _grid_mats_for(lmax, mmax, m_primary)
        return s2_silu_sep(x, scalars, tg, fg)
    out_scalars = jax.nn.silu(scalars)[:, None, :]
    out_tensors = s2_activation(x, lmax, mmax, m_primary)
    return jnp.concatenate([out_scalars, out_tensors[:, 1:, :]], axis=1)


class SO2Conv(nn.Module):
    """SO(2) convolution over all orders m in the edge frame.

    Reference SO2_Convolution (EF_layers.py:732-875). Input/output are
    *truncated l-primary* arrays ``[E, n_trunc, C]``; the m-primary view is a
    static gather. ``edge_channels`` configures an internal RadialMLP whose
    output elementwise-modulates the inputs (internal_weights=False mode);
    ``extra_m0_features`` returns additional invariant channels from the m=0
    branch.
    """

    features: int
    lmax: int
    mmax: int
    edge_channels: Optional[Sequence[int]] = None  # radial MLP hidden dims
    extra_m0_features: Optional[int] = None
    # m-primary I/O: skip the per-edge layout-permutation gathers entirely
    # (the neighbours fold the permutation into their constant matrices)
    m_primary_in: bool = False
    m_primary_out: bool = False

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        x_edge: Optional[jax.Array] = None,
        fused_parts: bool = False,
        c_in: Optional[int] = None,
    ):
        """Fused execution: all m-blocks run as ONE matmul against a
        block-structured weight (the complex pair convolution
        [[K_r, K_i], [-K_i, K_r]] embedded per order), assembled from the
        per-m parameters at trace time. Removes the per-m slice/concat HBM
        round-trips that dominated the unfused profile.

        ``fused_parts=True`` declares the identical parameters but returns
        ``(section_weights, bias, rad_full)`` instead of computing — the
        inputs to the fully-fused edge-attention kernel
        (ops/pallas/so2_attn.py), which runs both convolutions and the S2
        activation of a GraphAttention in one Pallas call. ``x`` may be any
        array with the right trailing channel dim (values unused) or None
        with ``c_in`` given.
        """
        mapping = CoefficientMapping(self.lmax, self.mmax)
        E = x.shape[0] if x is not None else (x_edge.shape[0] if x_edge is not None else 0)
        c_in = x.shape[-1] if x is not None else c_in
        F = self.features
        extra = self.extra_m0_features or 0
        m_sizes = mapping.m_size
        n0 = m_sizes[0]
        n_trunc = mapping.n_trunc
        in_w = n_trunc * c_in
        out_w = n_trunc * F + extra

        from jax.ad_checkpoint import checkpoint_name

        if not fused_parts:
            if self.m_primary_in:
                xm = x.reshape(E, in_w)
            else:
                xm = mapping.to_m_primary(x).reshape(E, in_w)
            # re-tag the flat view: remat policies exclude NAMED values, but
            # the reshape is a distinct value the partial-eval would happily
            # save instead of the tagged [E, n_trunc, C] form
            xm = checkpoint_name(xm, "conv_wide")

        # ---- radial modulation (reference SO2_Convolution rad_func path) ----
        rad_full = None
        if self.edge_channels is not None:
            total_rad = n0 * c_in + sum(s * c_in for s in m_sizes[1:])
            rad = RadialMLP(tuple(self.edge_channels) + (total_rad,))(x_edge)
            # expand: m0 rows map 1:1; each m>0 radial segment is shared by
            # its cos and sin coefficient rows (EF_layers.py:847-850).
            # Built from slices+concat — a feature-axis jnp.take here lowers
            # to a serialising XLA while loop on TPU (round-2 profile).
            parts = [rad[:, : n0 * c_in]]
            off = n0 * c_in
            for s in m_sizes[1:]:
                seg = rad[:, off : off + s * c_in]
                parts.extend((seg, seg))  # cos rows, sin rows
                off += s * c_in
            rad_full = jnp.concatenate(parts, axis=-1)
            if not fused_parts:
                xm = xm * rad_full.astype(xm.dtype)

        # ---- parameters (same shapes as the reference's per-m Linears) ----
        bound0 = 1.0 / np.sqrt(n0 * c_in)
        w0 = self.param(
            "w_m0",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound0, bound0),
            (n0 * c_in, n0 * F + extra),
        )
        b0 = self.param(
            "b_m0",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound0, bound0),
            (n0 * F + extra,),
        )
        k_m = []
        for m in range(1, self.mmax + 1):
            sz = m_sizes[m]
            bound = 1.0 / np.sqrt(sz * c_in) / np.sqrt(2.0)
            k_m.append(
                self.param(
                    f"w_m{m}",
                    lambda k, s, b=bound: jax.random.uniform(k, s, jnp.float32, -b, b),
                    (sz * c_in, 2 * sz * F),
                )
            )

        # ---- one matmul per order m, on contiguous m-primary slices ----
        # A single dense block-embedded weight [in_w, out_w] (round-1 design)
        # costs ~3x the true block FLOPs at the flagship shapes because the
        # off-block zeros are multiplied anyway; per-m matmuls do exactly the
        # block work and every slice keeps >=128 output lanes on the MXU.
        del in_w, out_w  # shape bookkeeping only
        dt = compute_dtype()
        W_ms = []
        for m in range(1, self.mmax + 1):
            sz = m_sizes[m]
            K = k_m[m - 1]
            K_r, K_i = K[:, : sz * F], K[:, sz * F :]
            # complex pair convolution [cos; sin] @ [[K_r, K_i], [-K_i, K_r]]
            W_ms.append(
                jnp.concatenate(
                    [
                        jnp.concatenate([K_r, K_i], axis=1),
                        jnp.concatenate([-K_i, K_r], axis=1),
                    ],
                    axis=0,
                )
            )
        if fused_parts:
            if rad_full is not None:
                rad_full = rad_full.reshape(E, n_trunc, c_in)
            return [w0] + W_ms, b0, rad_full

        x0 = xm[:, : n0 * c_in].astype(dt)
        y0 = x0 @ w0.astype(dt) + b0.astype(dt)
        outs = [y0[:, : n0 * F]]
        off = n0 * c_in
        for m in range(1, self.mmax + 1):
            sz = m_sizes[m]
            outs.append(
                xm[:, off : off + 2 * sz * c_in].astype(dt) @ W_ms[m - 1].astype(dt)
            )
            off += 2 * sz * c_in
        y = jnp.concatenate(outs, axis=-1)
        out = y.reshape(E, n_trunc, F)
        if not self.m_primary_out:
            out = mapping.to_l_primary(out)
        if extra:
            return out, y0[:, n0 * F :]
        return out
