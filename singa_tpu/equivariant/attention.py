"""SO(2) equivariant graph attention, feed-forward and transformer blocks.

Re-design of the reference's SO2EquivariantGraphAttention / FeedForwardNetwork /
TransBlockV2 / EdgeDegreeEmbedding (/root/reference/model/EF_layers.py:23-149,
152-270, 878-1204, 1207-1410) on flat padded edge lists. Heterogeneous
(ligand<->protein) edges use the same modules with distinct source/target
feature arrays; unlike the reference, data flow is purely functional (the
reference mutates its input dict in place across blocks, EF_layers.py:1352-1366
— a quirk we deliberately do not replicate).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.dtypes import compute_dtype
from singa_tpu.equivariant import so3
from singa_tpu.equivariant.layers import (
    Linear,
    RadialMLP,
    SO2Conv,
    get_norm_layer,
    separable_s2_activation,
    smooth_leaky_relu,
)
from singa_tpu.ops.neighbors import EdgeEngine


def _force_fused_so2() -> bool:
    """Test hook: run the fused SO2 edge-attention kernel (interpret mode)
    off-TPU."""
    import os

    return bool(os.environ.get("SINGA_TPU_FORCE_FUSED_SO2"))


def _fused_so2_enabled() -> bool:
    """Opt-in hook for the fused SO2 edge-attention kernel.

    Default OFF: measured fwd+bwd at flagship shapes is 40.1 ms vs 21.5 ms
    for the composed XLA chain (tools/bench_so2_attn.py, round 3) — the
    channel-padded conv-1 (32->128 lanes, 4x FLOPs) and the small-K rotate
    matmuls keep the kernel below XLA's fusion here. Kept as an opt-in and
    under parity tests pending a tighter-layout redesign."""
    import os

    return bool(os.environ.get("SINGA_TPU_FUSED_SO2"))


class EdgeDegreeEmbedding(nn.Module):
    """Invariant edge scalars -> m=0 edge-frame features -> rotate back ->
    degree-rescaled sum at the target node (EF_layers.py:86-149)."""

    sphere_channels: int
    lmax: int
    mmax: int
    edge_channels: Sequence[int]  # radial hidden dims
    rescale_factor: float

    @nn.compact
    def __call__(
        self,
        x_edge: jax.Array,  # [B*E, De]
        edges: EdgeEngine,
        wigner: jax.Array,
    ) -> jax.Array:
        mapping = so3.CoefficientMapping(self.lmax, self.mmax)
        n0 = mapping.m_size[0]
        rad = RadialMLP(tuple(self.edge_channels) + (n0 * self.sphere_channels,))(
            x_edge
        )
        rad = rad.reshape(-1, n0, self.sphere_channels)
        # in the m-primary layout the m=0 block is the FIRST n0 contiguous
        # rows: a concat instead of the scatter the l-primary layout needed
        x = jnp.concatenate(
            [
                rad,
                jnp.zeros(
                    (x_edge.shape[0], mapping.n_trunc - n0, self.sphere_channels),
                    rad.dtype,
                ),
            ],
            axis=1,
        )
        x = so3.rotate_inv(wigner, x, self.lmax, self.mmax, m_primary=True)
        out = edges.scatter_dst(x)
        return out / self.rescale_factor


class FeedForwardNetwork(nn.Module):
    """SO3 linear -> activation -> SO3 linear (EF_layers.py:152-270).

    Three activation variants, matching the reference's config axes:
      * ``s2`` — separable S2 grid activation (use_sep_s2_act=True, the
        reference's shipped default). On TPU the whole block runs as ONE
        fused Pallas kernel (ops/pallas/so3_ffn.py): the [N, 49, hidden]
        intermediates and the [N, hidden, G] grid tensor (784 MB / ~3 GB at
        flagship shapes) never exist outside VMEM, forward or backward. The
        XLA path below is the parity reference (CPU, tests,
        SINGA_TPU_NO_PALLAS=1).
      * ``gate`` — GateActivation (use_gate_act=True, EF_layers.py:220-223,
        1683-1733): sigmoid gates from the l=0 scalars multiply each degree;
        NO grid transforms. Removes the FFN's dominant S2-grid matmuls
        (~56% of the round-3 step's useful FLOPs) — the round-4 fast recipe.
      * ``grid`` — grid-space 3-layer MLP (use_grid_mlp=True +
        use_sep_s2_act=True, EF_layers.py:203-216); parity coverage only,
        FLOP-heavy by construction.
    """

    hidden_channels: int
    output_channels: int
    lmax: int
    activation: str = "s2"  # "s2" | "gate" | "grid"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from jax.ad_checkpoint import checkpoint_name

        from singa_tpu.dtypes import compute_dtype
        from singa_tpu.equivariant.layers import (
            _grid_mats_for,
            _use_pallas,
            add_l0,
            gate_activation,
            torch_linear_kernel_init,
        )

        C = x.shape[-1]
        L = self.lmax + 1
        H = self.hidden_channels
        Co = self.output_channels

        def unif(fan_in):
            bound = 1.0 / np.sqrt(fan_in)
            return lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound)

        w1 = self.param("w1", unif(C), (L, H, C))
        b1 = self.param("b1", nn.initializers.zeros, (H,))
        w2 = self.param("w2", unif(H), (L, Co, H))
        b2 = self.param("b2", nn.initializers.zeros, (Co,))
        dt = compute_dtype()
        l_of = so3.CoefficientMapping(self.lmax, self.lmax).l_of_full

        def lin(v, w, b):
            we = jnp.take(w.astype(dt), l_of, axis=0)  # [I, out, in]
            return add_l0(jnp.einsum("nic,ioc->nio", v.astype(dt), we), b)

        if self.activation == "gate":
            # reference gating_linear: Linear(C, lmax*H) on the l=0 scalars
            wg = self.param("gate_kernel", torch_linear_kernel_init, (C, self.lmax * H))
            bg = self.param("gate_bias", unif(C), (self.lmax * H,))
            if _use_pallas():
                # one fused kernel: the [N, I, H] hidden (686 MB bf16/call at
                # flagship shapes) never leaves VMEM — the XLA path below
                # OOM'd flagship batch 32 by 150 MB on exactly those saved
                # intermediates (round-4 compile log)
                from singa_tpu.ops.pallas.so3_ffn import so3_gate_ffn_fused

                return so3_gate_ffn_fused(
                    x.astype(dt),
                    jnp.swapaxes(w1, 1, 2),  # [L, C, H]
                    b1,
                    wg,
                    bg,
                    jnp.swapaxes(w2, 1, 2),  # [L, H, Co]
                    b2,
                    self.lmax,
                )
            gating = x[:, 0, :].astype(dt) @ wg.astype(dt) + bg.astype(dt)
            # tag the wide [N, I, H] intermediates so the 's2'/'s2x' remat
            # policies recompute them instead of saving ~700 MB per call
            h = checkpoint_name(lin(x, w1, b1), "s2_grid")
            h = checkpoint_name(
                gate_activation(gating, h, self.lmax, self.lmax), "s2_grid"
            )
            return lin(h, w2, b2)

        if self.activation == "grid":
            # use_grid_mlp + use_sep_s2_act: scalar MLP on l=0, 3-layer
            # pointwise MLP on the full-resolution grid (no biases), scalars
            # re-injected after from_grid (EF_layers.py:238-262)
            wsc = self.param("scalar_kernel", torch_linear_kernel_init, (C, H))
            bsc = self.param("scalar_bias", unif(C), (H,))
            gm = [
                self.param(f"grid_mlp_{i}", torch_linear_kernel_init, (H, H))
                for i in range(3)
            ]
            scalars = jax.nn.silu(x[:, 0, :].astype(dt) @ wsc.astype(dt) + bsc.astype(dt))
            h = lin(x, w1, b1)
            tg, fg = _grid_mats_for(self.lmax, self.lmax, False)
            g = checkpoint_name(
                jnp.einsum("bai,nic->nbac", jnp.asarray(tg, h.dtype), h), "s2_grid"
            )
            g = jax.nn.silu(g @ gm[0].astype(dt))
            g = jax.nn.silu(g @ gm[1].astype(dt))
            g = g @ gm[2].astype(dt)
            h = jnp.einsum("bai,nbac->nic", jnp.asarray(fg, g.dtype), g)
            h = jnp.concatenate([scalars[:, None, :], h[:, 1:, :]], axis=1)
            return lin(h, w2, b2)

        if self.activation != "s2":
            raise ValueError(f"unknown ffn activation {self.activation!r}")

        wg = self.param("gate_kernel", torch_linear_kernel_init, (C, H))
        bg = self.param("gate_bias", unif(C), (H,))
        tg, fg = _grid_mats_for(self.lmax, self.lmax, False)
        tg2 = np.ascontiguousarray(tg.reshape(-1, tg.shape[-1]))
        fg2 = np.ascontiguousarray(fg.reshape(-1, fg.shape[-1]))
        if _use_pallas():
            from singa_tpu.ops.pallas.so3_ffn import pad_grid_mat, so3_ffn_fused

            return so3_ffn_fused(
                x.astype(dt),
                jnp.swapaxes(w1, 1, 2),  # [L, C, H]
                b1,
                wg,
                bg,
                jnp.swapaxes(w2, 1, 2),  # [L, H, Co]
                b2,
                jnp.asarray(pad_grid_mat(tg2, self.lmax)),
                jnp.asarray(pad_grid_mat(fg2, self.lmax)),
                self.lmax,
            )

        # ---- XLA reference path (identical math) ----
        gating = x[:, 0, :].astype(dt) @ wg.astype(dt) + bg.astype(dt)
        h = lin(x, w1, b1)
        h = separable_s2_activation(gating, h, self.lmax, self.lmax)
        return lin(h, w2, b2)


class GraphAttention(nn.Module):
    """SO2EquivariantGraphAttention (EF_layers.py:878-1204), config path:
    use_s2_act_attn=False, use_attn_renorm=True, use_gate_act=False,
    use_sep_s2_act=True, use_m_share_rad=False."""

    sphere_channels: int
    hidden_channels: int
    num_heads: int
    attn_alpha_channels: int
    attn_value_channels: int
    output_channels: int
    lmax: int
    mmax: int
    edge_channels: Sequence[int]

    @nn.compact
    def __call__(
        self,
        x_src: jax.Array,  # [N_src, coeffs, C]
        x_dst: jax.Array,  # [N_dst, coeffs, C]
        x_edge: jax.Array,  # [B*E, De]
        edges: EdgeEngine,
        wigner: jax.Array,
    ) -> jax.Array:
        xs = edges.gather_src(x_src)
        xt = edges.gather_dst(x_dst)
        msg = jnp.concatenate([xs, xt], axis=-1)  # [E, coeffs, 2C]

        from jax.ad_checkpoint import checkpoint_name

        from singa_tpu.equivariant.layers import _use_pallas

        extra = self.num_heads * self.attn_alpha_channels + self.hidden_channels
        alpha_ch = self.num_heads * self.attn_alpha_channels
        F2 = self.num_heads * self.attn_value_channels
        conv1 = SO2Conv(
            features=self.hidden_channels,
            lmax=self.lmax,
            mmax=self.mmax,
            edge_channels=self.edge_channels,
            extra_m0_features=extra,
            m_primary_in=True,
            m_primary_out=True,
            name="so2_conv_1",
        )
        conv2 = SO2Conv(
            features=F2,
            lmax=self.lmax,
            mmax=self.mmax,
            m_primary_in=True,
            m_primary_out=True,
            name="so2_conv_2",
        )

        fused = (
            ((_use_pallas() and _fused_so2_enabled()) or _force_fused_so2())
            and isinstance(wigner, so3.EdgeFrame)
            and self.mmax == 2
            and self.hidden_channels % 128 == 0
        )
        if fused:
            # ONE Pallas kernel for rotate -> SO2 conv 1 -> separable S2 ->
            # SO2 conv 2 (ops/pallas/so2_attn.py): in the round-3 profile
            # this chain ran as ~20 XLA ops round-tripping HBM per stage.
            from singa_tpu.ops.pallas.so2_attn import _grids, so2_attn_fused

            w1s, b1, rad1 = conv1(msg, x_edge, fused_parts=True)
            w2s, b2, _ = conv2(
                None, None, fused_parts=True, c_in=self.hidden_channels
            )
            tgj, fgj = (jnp.asarray(g) for g in _grids(self.lmax, self.mmax))
            dt = compute_dtype()
            zs = so2_attn_fused(
                msg.astype(dt),
                rad1.astype(dt),
                wigner.phi,
                wigner.beta,
                w1s,
                b1,
                w2s,
                b2,
                tgj,
                fgj,
                self.lmax,
                self.mmax,
                self.hidden_channels,
                F2,
                alpha_ch,
                jax.default_backend() != "tpu",
            )
            mapping0 = so3.CoefficientMapping(self.lmax, self.mmax)
            secs = [mapping0.m_size[0]] + [2 * s for s in mapping0.m_size[1:]]
            E = msg.shape[0]
            msg = jnp.concatenate(
                [z.reshape(E, r, F2) for z, r in zip(zs[:-1], secs)], axis=1
            )
            x0_extra = zs[-1]
            x_alpha = x0_extra[:, :alpha_ch]
            msg = checkpoint_name(msg, "conv_wide")
        else:
            # the whole edge-frame chain runs m-primary: every layout
            # permutation is folded into the constant matrices on either side
            # (J, grids, per-degree projection weights) — zero per-edge
            # permutation gathers
            msg = so3.rotate(wigner, msg, self.lmax, self.mmax, m_primary=True)
            msg, x0_extra = conv1(msg, x_edge)
            x_alpha = x0_extra[:, :alpha_ch]
            gating = x0_extra[:, alpha_ch:]
            # the widest edge tensors in the block ([E, 29, 128/112]); under
            # the 's2x' remat policy they are recomputed instead of saved
            msg = checkpoint_name(msg, "conv_wide")
            msg = separable_s2_activation(
                gating, msg, self.lmax, self.mmax, m_primary=True
            )
            msg = conv2(msg)
            msg = checkpoint_name(msg, "conv_wide")

        # attention logits from the invariant m=0 channel
        x_alpha = x_alpha.reshape(-1, self.num_heads, self.attn_alpha_channels)
        # epsilon: torch nn.LayerNorm default (1e-5), not flax's 1e-6
        x_alpha = nn.LayerNorm(epsilon=1e-5, name="alpha_norm")(x_alpha)
        x_alpha = smooth_leaky_relu(x_alpha)
        bound = 1.0 / np.sqrt(self.attn_alpha_channels)
        alpha_dot = self.param(
            "alpha_dot",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.num_heads, self.attn_alpha_channels),
        )
        alpha = jnp.einsum("ehk,hk->eh", x_alpha, alpha_dot.astype(x_alpha.dtype))
        alpha = edges.softmax_dst(alpha)

        E, n_trunc, _ = msg.shape
        msg = msg.reshape(E, n_trunc, self.num_heads, self.attn_value_channels)
        # keep the weighted messages in compute dtype: the LayerNorm'd alpha
        # path is f32 and the promoted product was saved as a 786 MB f32
        # residual per block at batch 64
        msg = msg * alpha.astype(msg.dtype)[:, None, :, None]
        msg = msg.reshape(E, n_trunc, self.num_heads * self.attn_value_channels)

        # Output projection applied per edge *before* rotate-back + reduce.
        # The per-degree channel mix commutes with the (block-diagonal) Wigner
        # rotation, the truncation rescale and the edge sum, so this equals
        # the reference's project-after-reduce (EF_layers.py:1196-1203) while
        # shrinking rotate_inv+scatter traffic by heads*value/out = 7x.
        c_in = self.num_heads * self.attn_value_channels
        bound = 1.0 / np.sqrt(c_in)
        proj_w = self.param(
            "proj_w",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.lmax + 1, self.output_channels, c_in),
        )
        proj_b = self.param("proj_b", nn.initializers.zeros, (self.output_channels,))
        dt = compute_dtype()
        mapping = so3.CoefficientMapping(self.lmax, self.mmax)
        l_of_m = mapping.l_of_trunc[mapping.l_to_m]  # per-degree idx, m-primary
        wt = jnp.take(proj_w.astype(dt), l_of_m, axis=0)
        msg = jnp.einsum("eic,ioc->eio", msg.astype(dt), wt)

        msg = so3.rotate_inv(wigner, msg, self.lmax, self.mmax, m_primary=True)
        out = edges.scatter_dst(msg)
        from singa_tpu.equivariant.layers import add_l0

        return add_l0(out, proj_b)


class TransBlock(nn.Module):
    """Pre-norm attention + FFN residual block (TransBlockV2,
    EF_layers.py:1207-1410). One instance is shared across all four passes of
    the embedding, as in the reference (Embedding.py:159-196)."""

    sphere_channels: int
    attn_hidden_channels: int
    attn_alpha_channels: int
    attn_value_channels: int
    ffn_hidden_channels: int
    num_heads: int
    lmax: int
    mmax: int
    edge_channels: Sequence[int]
    norm_type: str = "rms_norm_sh"
    ffn_activation: str = "s2"

    @nn.compact
    def __call__(
        self,
        x_src: jax.Array,
        x_dst: jax.Array,
        x_edge: jax.Array,
        edges: EdgeEngine,
        wigner: jax.Array,
    ) -> jax.Array:
        norm_1 = get_norm_layer(self.norm_type, self.lmax)
        xs = norm_1(x_src)
        xt = norm_1(x_dst) if x_dst is not x_src else xs
        attn = GraphAttention(
            sphere_channels=self.sphere_channels,
            hidden_channels=self.attn_hidden_channels,
            num_heads=self.num_heads,
            attn_alpha_channels=self.attn_alpha_channels,
            attn_value_channels=self.attn_value_channels,
            output_channels=self.sphere_channels,
            lmax=self.lmax,
            mmax=self.mmax,
            edge_channels=self.edge_channels,
            name="ga",
        )(xs, xt, x_edge, edges, wigner)
        x = x_dst + attn

        res = x
        x = get_norm_layer(self.norm_type, self.lmax)(x)
        x = FeedForwardNetwork(
            hidden_channels=self.ffn_hidden_channels,
            output_channels=self.sphere_channels,
            lmax=self.lmax,
            activation=self.ffn_activation,
            name="ffn",
        )(x)
        return x + res
