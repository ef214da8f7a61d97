"""Fused SO(2) edge-attention chain as one Pallas TPU kernel.

Fuses the per-edge message transform of GraphAttention (reference
SO2EquivariantGraphAttention, /root/reference/model/EF_layers.py:878-1204):

    msg = rotate(wigner, concat(x_src, x_dst))      # edge frame, m-primary
    msg, extra = SO2Conv_1(msg * rad)               # + alpha/gating channels
    msg = separable_s2(gating, msg)                 # grid SiLU, row0 = gate
    msg = SO2Conv_2(msg)

into a single kernel (custom VJP; backward is one kernel too). In the
round-3 step profile these stages ran as ~20 separate XLA ops per call
site — the z-combine elementwise chains, J-factor matmuls, per-m conv
matmuls and grid transforms each round-tripped 60-200 MB of HBM at <1%
MFU (rotate alone: ~10 ms/call). Here one HBM read of the gathered edge
features produces the conv-2 output directly.

Layout rules (probed on hardware, tools/probe_mosaic.py): Mosaic merges/
splits the lane dim only at 128-aligned boundaries, supports last-two-dim
transposes, sublane concats and one-dim dot_general contractions. Hence:

  * the rotate runs in structured layouts ([TE, I, C] / [TE, C, I]) with
    the z-rotation flips FOLDED into constant matrices: for m-frequency
    scale vectors, diag(sin) . FLIP == -FLIP . diag(sin), so
    J^T Z(theta) x == J^T(cos . x) + (J^T FLIP)(sin . x) — four constant
    matmuls, no per-edge permutations;
  * the SO(2) convolutions contract (coefficient, channel) jointly, so
    their input is lane-flattened with the channel dim zero-padded to 128
    ([TE, 29, 32] -> pad -> [TE, 29, 128] -> reshape [TE, 3712]); conv-1
    weights carry matching zero rows (exact zeros through every term,
    ~1.6x padded FLOPs on conv-1 only — conv-2's hidden width is already
    a lane multiple);
  * per-m sections are contiguous lane slices of the flat layout, giving
    clean [TE, 896..1536] x [., 784..1536] MXU matmuls (K >= 784).

Weight-gradient accumulators live in VMEM across the sequential edge-tile
grid (constant out-block index, first-step zero init); the scoped VMEM
limit is raised via CompilerParams (v5e has 128 MB; the default 16 MB cap
sized the FFN kernel's tiles, ops/pallas/so3_ffn.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from singa_tpu.equivariant.so3 import CoefficientMapping, _JLayout, num_coeffs

LANE = 128


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _silu_grad(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


@functools.lru_cache(maxsize=None)
def _meta(lmax: int, mmax: int):
    """Static section layout + rotate constants for one resolution."""
    mapping = CoefficientMapping(lmax, mmax)
    lay = _JLayout(lmax, mmax)
    flip = lay.flip
    JT = lay.J.T.astype(np.float32)  # [I_full, I_full]
    JTF = JT[:, flip]  # J^T FLIP
    JK = lay.J_kept_m.astype(np.float32)  # [n_trunc, I_full] m-primary rows
    JKF = JK[:, flip]
    m_of = lay.m_of.astype(np.float32)  # [I_full]
    # m-primary sections: rows per section (m0: n0; m>=1: cos+sin)
    secs = [mapping.m_size[0]] + [2 * s for s in mapping.m_size[1:]]
    return mapping, secs, JT, JTF, JK, JKF, m_of


def _pad_c(c: int) -> int:
    return ((c + LANE - 1) // LANE) * LANE


def pad_conv_weight(w: jax.Array, rows: int, c_in: int) -> jax.Array:
    """Canonical section weight [rows*c_in, out] -> channel-padded
    [rows*pad_c, out] with zero rows (trace-time, outside the kernel)."""
    cp = _pad_c(c_in)
    if cp == c_in:
        return w
    out = w.shape[1]
    w3 = w.reshape(rows, c_in, out)
    w3 = jnp.pad(w3, ((0, 0), (0, cp - c_in), (0, 0)))
    return w3.reshape(rows * cp, out)


def _rot_tables(phi: jax.Array, beta: jax.Array, m_of: np.ndarray):
    """cos/sin tables for Z(-phi), Z(-beta) on the full coefficient set."""
    m = jnp.asarray(m_of)
    cm_p = jnp.cos(m[None] * (-phi)[:, None])
    sm_p = jnp.sin(m[None] * (-phi)[:, None])
    cm_b = jnp.cos(m[None] * (-beta)[:, None])
    sm_b = jnp.sin(m[None] * (-beta)[:, None])
    return cm_p, sm_p, cm_b, sm_b


def _dot_sub(a, m):
    """[TE, I, C] x [O, I] (contract sublane I) -> [TE, C, O]."""
    return jax.lax.dot_general(
        a, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_lane(a, m):
    """[TE, C, I] x [O, I] (contract lane I) -> [TE, C, O]."""
    return jax.lax.dot_general(
        a, m, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_lane_t(a, m):
    """[TE, C, O] x [O, I] (contract lane O over m's FIRST dim) -> [TE, C, I]."""
    return jax.lax.dot_general(
        a, m, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _outer(a, b):
    """[TE, A] x [TE, B] -> [A, B]."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _row0(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1) == 0


def _rotate_fwd(x, cmp_, smp, cmb, smb, jt, jtf, jk, jkf, dt):
    """[TE, I_full, C] l-primary -> [TE, C, n_trunc] m-primary edge frame."""
    t = (x * cmp_[:, :, None]).astype(dt)
    s = (x * smp[:, :, None]).astype(dt)
    t2 = _dot_sub(t, jt) + _dot_sub(s, jtf)  # [TE, C, I_full] f32
    u = (t2 * cmb[:, None, :]).astype(dt)
    v = (t2 * smb[:, None, :]).astype(dt)
    return _dot_lane(u, jk) + _dot_lane(v, jkf)  # [TE, C, n_trunc] f32


def _rotate_bwd(dmpT, cmp_, smp, cmb, smb, jt, jtf, jk, jkf, dt):
    """dmpT [TE, C, n_trunc] -> dx [TE, I_full, C] (transpose of _rotate_fwd)."""
    dmpT = dmpT.astype(dt)
    du = _dot_lane_t(dmpT, jk)  # [TE, C, I_full] f32
    dv = _dot_lane_t(dmpT, jkf)
    dt2 = (du * cmb[:, None, :] + dv * smb[:, None, :]).astype(dt)
    # t2[.,c,a] = sum_i t[.,i,c] JT[a,i]  =>  dt[.,c,i] = sum_a dt2[.,c,a] JT[a,i]
    dtt = _dot_lane_t(dt2, jt)  # [TE, C, I_full]
    dss = _dot_lane_t(dt2, jtf)
    dxT = dtt * cmp_[:, None, :] + dss * smp[:, None, :]
    return dxT.transpose(0, 2, 1)  # [TE, I_full, C]


def _conv_sections(flat, ws, bias, secs, cp, dt):
    """flat [TE, n_trunc*cp] -> per-section outputs (f32). bias on sec 0."""
    outs = []
    off = 0
    for i, rows in enumerate(secs):
        y = _mm(flat[:, off : off + rows * cp].astype(dt), ws[i].astype(dt))
        if i == 0 and bias is not None:
            y = y + bias
        outs.append(y)
        off += rows * cp
    return outs


def _fwd_kernel(
    meta,
    x_ref, rad_ref, cmp_ref, smp_ref, cmb_ref, smb_ref,
    w10_ref, w11_ref, w12_ref, b1_ref, w20_ref, w21_ref, w22_ref, b2_ref,
    jt_ref, jtf_ref, jk_ref, jkf_ref, tg_ref, fg_ref,
    z0_ref, z1_ref, z2_ref, extra_ref,
):
    secs, c_in, H, F2, extra_ch, alpha_ch = meta
    cp = _pad_c(c_in)
    n_trunc = sum(secs)
    dt = x_ref.dtype
    TE = x_ref.shape[0]
    n0 = secs[0]

    mp = _rotate_fwd(
        x_ref[:], cmp_ref[:], smp_ref[:], cmb_ref[:], smb_ref[:],
        jt_ref[:].astype(dt), jtf_ref[:].astype(dt),
        jk_ref[:].astype(dt), jkf_ref[:].astype(dt), dt,
    )  # [TE, C, n_trunc]
    mp = mp.transpose(0, 2, 1)  # [TE, n_trunc, C]
    mp = mp * rad_ref[:].astype(jnp.float32)
    flat = jnp.pad(mp.astype(dt), ((0, 0), (0, 0), (0, cp - c_in))).reshape(
        TE, n_trunc * cp
    )

    w1s = [w10_ref[:], w11_ref[:], w12_ref[:]]
    ys = _conv_sections(flat, w1s, b1_ref[:], secs, cp, dt)
    extra = ys[0][:, n0 * H :]  # [TE, extra_ch]
    h = jnp.concatenate(
        [ys[0][:, : n0 * H].reshape(TE, n0, H)]
        + [y.reshape(TE, r, H) for y, r in zip(ys[1:], secs[1:])],
        axis=1,
    )  # [TE, n_trunc, H] f32

    grid = _dot_sub(h.astype(dt), tg_ref[:].astype(dt))  # [TE, H, G]
    act = _silu(grid).astype(dt)
    # fg [G, n_trunc]: mid[., i, h] = sum_g fg[g, i] act[., h, g]
    mid = _dot_lane_t(act, fg_ref[:].astype(dt))  # [TE, H, n_trunc]
    mid = mid.transpose(0, 2, 1)  # [TE, n_trunc, H]
    gate = _silu(extra[:, alpha_ch:])  # [TE, H]
    mid = jnp.where(_row0(mid.shape), gate[:, None, :], mid).astype(dt)

    mid_flat = mid.reshape(TE, n_trunc * H)
    w2s = [w20_ref[:], w21_ref[:], w22_ref[:]]
    zs = _conv_sections_h(mid_flat, w2s, b2_ref[:], secs, H, dt)
    z0_ref[:] = zs[0].astype(z0_ref.dtype)
    z1_ref[:] = zs[1].astype(z1_ref.dtype)
    z2_ref[:] = zs[2].astype(z2_ref.dtype)
    extra_ref[:] = extra.astype(extra_ref.dtype)


def _conv_sections_h(flat, ws, bias, secs, H, dt):
    outs = []
    off = 0
    for i, rows in enumerate(secs):
        y = _mm(flat[:, off : off + rows * H].astype(dt), ws[i].astype(dt))
        if i == 0 and bias is not None:
            y = y + bias
        outs.append(y)
        off += rows * H
    return outs


def _bwd_kernel(
    meta,
    x_ref, rad_ref, cmp_ref, smp_ref, cmb_ref, smb_ref,
    w10_ref, w11_ref, w12_ref, b1_ref, w20_ref, w21_ref, w22_ref,
    w10t_ref, w11t_ref, w12t_ref, w20t_ref, w21t_ref, w22t_ref,
    jt_ref, jtf_ref, jk_ref, jkf_ref, tg_ref, fg_ref,
    dz0_ref, dz1_ref, dz2_ref, dextra_ref,
    dx_ref, drad_ref,
    dw10_ref, dw11_ref, dw12_ref, db1_ref,
    dw20_ref, dw21_ref, dw22_ref, db2_ref,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dw10_ref, dw11_ref, dw12_ref, db1_ref,
                  dw20_ref, dw21_ref, dw22_ref, db2_ref):
            r[:] = jnp.zeros_like(r)

    secs, c_in, H, F2, extra_ch, alpha_ch = meta
    cp = _pad_c(c_in)
    n_trunc = sum(secs)
    dt = x_ref.dtype
    TE = x_ref.shape[0]
    n0 = secs[0]
    jt = jt_ref[:].astype(dt)
    jtf = jtf_ref[:].astype(dt)
    jk = jk_ref[:].astype(dt)
    jkf = jkf_ref[:].astype(dt)
    tg = tg_ref[:].astype(dt)
    fg = fg_ref[:].astype(dt)

    # ---- recompute forward ----
    mp0 = _rotate_fwd(
        x_ref[:], cmp_ref[:], smp_ref[:], cmb_ref[:], smb_ref[:],
        jt, jtf, jk, jkf, dt,
    ).transpose(0, 2, 1)  # [TE, n_trunc, C] pre-modulation
    rad = rad_ref[:].astype(jnp.float32)
    mp = mp0 * rad
    flat = jnp.pad(mp.astype(dt), ((0, 0), (0, 0), (0, cp - c_in))).reshape(
        TE, n_trunc * cp
    )
    w1s = [w10_ref[:], w11_ref[:], w12_ref[:]]
    ys = _conv_sections(flat, w1s, b1_ref[:], secs, cp, dt)
    extra = ys[0][:, n0 * H :]
    h = jnp.concatenate(
        [ys[0][:, : n0 * H].reshape(TE, n0, H)]
        + [y.reshape(TE, r, H) for y, r in zip(ys[1:], secs[1:])],
        axis=1,
    )
    grid = _dot_sub(h.astype(dt), tg)  # [TE, H, G]
    act = _silu(grid).astype(dt)

    # ---- backward through conv 2 ----
    mid = _dot_lane_t(act, fg).transpose(0, 2, 1)
    gate_in = extra[:, alpha_ch:]
    gate = _silu(gate_in)
    mid = jnp.where(_row0(mid.shape), gate[:, None, :], mid).astype(dt)
    mid_flat = mid.reshape(TE, n_trunc * H)

    dzs = [dz0_ref[:].astype(jnp.float32), dz1_ref[:].astype(jnp.float32),
           dz2_ref[:].astype(jnp.float32)]
    db2_ref[:] += jnp.sum(dzs[0], axis=0)
    # weight transposes are separate operands prepared at trace time — a .T
    # inside the kernel body re-lays-out the full matrix at EVERY grid step
    w2ts = [w20t_ref[:], w21t_ref[:], w22t_ref[:]]
    dw2_refs = [dw20_ref, dw21_ref, dw22_ref]
    dmid_parts = []
    off = 0
    for i, rows in enumerate(secs):
        sec = mid_flat[:, off : off + rows * H]
        dz = dzs[i].astype(dt)
        dw2_refs[i][:] += _outer(sec, dz)
        dmid_parts.append(_mm(dz, w2ts[i].astype(dt)))
        off += rows * H
    dmid_flat = jnp.concatenate(dmid_parts, axis=1)  # [TE, n_trunc*H] f32
    dmid = dmid_flat.reshape(TE, n_trunc, H)

    # ---- separable recombine: row0 belongs to the gate ----
    dgate = dmid[:, 0, :] * _silu_grad(gate_in)
    dmid = jnp.where(_row0(dmid.shape), 0.0, dmid).astype(dt)

    # ---- backward through the S2 activation ----
    # mid[., i, h] = sum_g fg[g, i] act[., h, g]
    # => dact[., h, g] = sum_i dmid[., i, h] fg[g, i]
    dact = _dot_lane(dmid.transpose(0, 2, 1).astype(dt), fg)  # [TE, H, G]
    dgrid = (_silu_grad(grid) * dact).astype(dt)
    # grid[., h, g] = sum_i h[., i, h] tg[g, i]
    # => dh[., i, h] = sum_g dgrid[., h, g] tg[g, i]
    dh = _dot_lane_t(dgrid, tg).transpose(0, 2, 1)  # [TE, n_trunc, H] f32

    # ---- backward through conv 1 ----
    dextra_total = dextra_ref[:].astype(jnp.float32)
    dextra_total = dextra_total + jnp.pad(dgate, ((0, 0), (alpha_ch, 0)))
    dys = [
        jnp.concatenate(
            [dh[:, :n0, :].reshape(TE, n0 * H), dextra_total], axis=1
        )
    ]
    off = n0
    for rows in secs[1:]:
        dys.append(dh[:, off : off + rows, :].reshape(TE, rows * H))
        off += rows
    db1_ref[:] += jnp.sum(dys[0], axis=0)
    dw1_refs = [dw10_ref, dw11_ref, dw12_ref]
    w1ts = [w10t_ref[:], w11t_ref[:], w12t_ref[:]]
    dflat_parts = []
    off = 0
    for i, rows in enumerate(secs):
        sec = flat[:, off : off + rows * cp]
        dy = dys[i].astype(dt)
        dw1_refs[i][:] += _outer(sec, dy)
        dflat_parts.append(_mm(dy, w1ts[i].astype(dt)))
        off += rows * cp
    dflat = jnp.concatenate(dflat_parts, axis=1)  # [TE, n_trunc*cp] f32
    dmp_mod = dflat.reshape(TE, n_trunc, cp)[:, :, :c_in]

    drad_ref[:] = (dmp_mod * mp0).astype(drad_ref.dtype)
    dmp = dmp_mod * rad
    dx = _rotate_bwd(
        dmp.transpose(0, 2, 1), cmp_ref[:], smp_ref[:], cmb_ref[:], smb_ref[:],
        jt, jtf, jk, jkf, dt,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _pad_e(x, te):
    pad = (-x.shape[0]) % te
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _grids(lmax, mmax):
    from singa_tpu.equivariant.layers import _grid_mats_for

    tg, fg = _grid_mats_for(lmax, mmax, m_primary=True)
    tg2 = np.ascontiguousarray(tg.reshape(-1, tg.shape[-1]).astype(np.float32))
    fg2 = np.ascontiguousarray(fg.reshape(-1, fg.shape[-1]).astype(np.float32))
    return tg2, fg2


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15)
)
def so2_attn_fused(
    x, rad, phi, beta, w1s, b1, w2s, b2, tgj, fgj,
    lmax, mmax, H, F2, alpha_ch, interpret=False,
):
    """The fused rotate + SO2Conv + separable-S2 + SO2Conv edge chain.

    x [E, (lmax+1)^2, C] l-primary gathered edge features; rad [E, n_trunc, C]
    radial modulation (m-primary rows); phi/beta [E] edge-frame angles;
    w1s/w2s per-m-section conv weights in the flat (row, channel) layout
    (section order: m0 rows, then cos|sin rows per m), w1s CHANNEL-PADDED via
    pad_conv_weight; b1 [n0*H + extra]; b2 [n0*F2]; tgj/fgj [G, n_trunc]
    m-primary grid matrices. Returns ([E, rows_m * F2] per section, extra).
    """
    mapping, secs, JT, JTF, JK, JKF, m_of = _meta(lmax, mmax)
    assert mmax == 2 and H % LANE == 0, "kernel specialised to mmax=2, H%128==0"
    E0 = x.shape[0]
    c_in = x.shape[-1]
    extra_ch = b1.shape[0] - secs[0] * H
    meta = (tuple(secs), c_in, H, F2, extra_ch, alpha_ch)
    # weights ride to VMEM in the compute dtype: f32 copies double both the
    # resident VMEM footprint and the HBM read (the kernel computes in dt)
    w1s = [pad_conv_weight(w, rows, c_in).astype(x.dtype) for w, rows in zip(w1s, secs)]
    w2s = [w.astype(x.dtype) for w in w2s]
    TE = 128
    xp = _pad_e(x, TE)
    E = xp.shape[0]
    cm_p, sm_p, cm_b, sm_b = _rot_tables(_pad_e(phi, TE), _pad_e(beta, TE), m_of)
    radp = _pad_e(rad, TE)
    grid_dims = (E // TE,)
    full = lambda a: pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM)
    tile = lambda *s: pl.BlockSpec((TE,) + s, lambda m: (m,) + (0,) * len(s), memory_space=pltpu.VMEM)
    n_trunc = sum(secs)
    consts = [jnp.asarray(a) for a in (JT, JTF, JK, JKF)] + [tgj, fgj]
    outs = [
        (jax.ShapeDtypeStruct((E, rows * F2), x.dtype), tile(rows * F2))
        for rows in secs
    ] + [(jax.ShapeDtypeStruct((E, extra_ch), x.dtype), tile(extra_ch))]
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, meta),
        out_shape=tuple(o[0] for o in outs),
        grid=grid_dims,
        in_specs=[
            tile(num_coeffs(lmax), c_in), tile(n_trunc, c_in),
            tile(num_coeffs(lmax)), tile(num_coeffs(lmax)),
            tile(num_coeffs(lmax)), tile(num_coeffs(lmax)),
        ]
        + [full(w) for w in w1s] + [full(b1)]
        + [full(w) for w in w2s] + [full(b2)]
        + [full(c) for c in consts],
        out_specs=tuple(o[1] for o in outs),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, radp, cm_p, sm_p, cm_b, sm_b, *w1s, b1, *w2s, b2, *consts)
    return tuple(r[:E0] for r in res)


def _fwd(x, rad, phi, beta, w1s, b1, w2s, b2, tgj, fgj,
         lmax, mmax, H, F2, alpha_ch, interpret):
    out = so2_attn_fused(
        x, rad, phi, beta, w1s, b1, w2s, b2, tgj, fgj,
        lmax, mmax, H, F2, alpha_ch, interpret,
    )
    return out, (x, rad, phi, beta, w1s, b1, w2s, tgj, fgj)


def _bwd(lmax, mmax, H, F2, alpha_ch, interpret, res, cts):
    x, rad, phi, beta, w1s, b1, w2s, tgj, fgj = res
    mapping, secs, JT, JTF, JK, JKF, m_of = _meta(lmax, mmax)
    E0 = x.shape[0]
    c_in = x.shape[-1]
    cp = _pad_c(c_in)
    extra_ch = b1.shape[0] - secs[0] * H
    meta = (tuple(secs), c_in, H, F2, extra_ch, alpha_ch)
    w1p = [pad_conv_weight(w, rows, c_in).astype(x.dtype) for w, rows in zip(w1s, secs)]
    w2s = [w.astype(x.dtype) for w in w2s]
    w1t = [w.T for w in w1p]
    w2t = [w.T for w in w2s]
    TE = 128
    xp = _pad_e(x, TE)
    E = xp.shape[0]
    cm_p, sm_p, cm_b, sm_b = _rot_tables(_pad_e(phi, TE), _pad_e(beta, TE), m_of)
    radp = _pad_e(rad, TE)
    dzs = [_pad_e(c, TE) for c in cts[:-1]]
    dextra = _pad_e(cts[-1], TE)
    grid_dims = (E // TE,)
    full = lambda a: pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM)
    tile = lambda *s: pl.BlockSpec((TE,) + s, lambda m: (m,) + (0,) * len(s), memory_space=pltpu.VMEM)
    n_trunc = sum(secs)
    consts = [jnp.asarray(a) for a in (JT, JTF, JK, JKF)] + [tgj, fgj]
    acc = lambda a: (
        jax.ShapeDtypeStruct(a.shape, jnp.float32),
        pl.BlockSpec(a.shape, lambda m: (0,) * a.ndim, memory_space=pltpu.VMEM),
    )
    outs = [
        (jax.ShapeDtypeStruct(xp.shape, x.dtype), tile(num_coeffs(lmax), c_in)),
        (jax.ShapeDtypeStruct(radp.shape, rad.dtype), tile(n_trunc, c_in)),
        acc(w1p[0]), acc(w1p[1]), acc(w1p[2]), acc(b1),
        acc(w2s[0]), acc(w2s[1]), acc(w2s[2]),
        acc(jnp.zeros((secs[0] * F2,))),
    ]
    res2 = pl.pallas_call(
        functools.partial(_bwd_kernel, meta),
        out_shape=tuple(o[0] for o in outs),
        grid=grid_dims,
        in_specs=[
            tile(num_coeffs(lmax), c_in), tile(n_trunc, c_in),
            tile(num_coeffs(lmax)), tile(num_coeffs(lmax)),
            tile(num_coeffs(lmax)), tile(num_coeffs(lmax)),
        ]
        + [full(w) for w in w1p] + [full(b1)]
        + [full(w) for w in w2s]
        + [full(w) for w in w1t] + [full(w) for w in w2t]
        + [full(c) for c in consts]
        + [tile(rows * F2) for rows in secs] + [tile(extra_ch)],
        out_specs=tuple(o[1] for o in outs),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(
        xp, radp, cm_p, sm_p, cm_b, sm_b, *w1p, b1, *w2s, *w1t, *w2t, *consts,
        *dzs, dextra,
    )
    dx, drad = res2[0][:E0], res2[1][:E0]

    def unpad_w(g, rows, w):
        if cp == c_in:
            return g.astype(w.dtype)
        out = g.shape[1]
        return (
            g.reshape(rows, cp, out)[:, :c_in, :].reshape(rows * c_in, out)
        ).astype(w.dtype)

    dw1s = [unpad_w(g, rows, w) for g, rows, w in zip(res2[2:5], secs, w1s)]
    db1 = res2[5].astype(b1.dtype)
    dw2s = [g.astype(w.dtype) for g, w in zip(res2[6:9], w2s)]
    db2 = res2[9].astype(b1.dtype)
    zeros = jnp.zeros_like
    return (dx, drad, zeros(phi), zeros(beta), dw1s, db1, dw2s, db2,
            zeros(tgj), zeros(fgj))


so2_attn_fused.defvjp(_fwd, _bwd)
