"""Sphere-grid transforms for pointwise S2 activations.

Self-contained replacement for e3nn's ToS2Grid/FromS2Grid as used by the
reference SO3_Grid (/root/reference/model/EF_layers.py:531-621). Matrices are
built offline in float64 from our own spherical harmonics with Gauss-Legendre
latitude quadrature and uniform longitude quadrature, then cached as
constants. Component normalisation (Y scaled to ||Y||^2 = 4pi) matches the
reference's 'component' option; the m-truncation rescale
sqrt((2l+1)/(2mmax+1)) for l > mmax is applied to both directions, as the
reference does (EF_layers.py:571-597).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from singa_tpu.equivariant.sh import real_sph_harm


@functools.lru_cache(maxsize=None)
def _grid_mats(lmax: int, mmax: int) -> tuple[np.ndarray, np.ndarray]:
    lat = 2 * (lmax + 1)
    long = 2 * (mmax + 1) + 1 if lmax == mmax else 2 * mmax + 1

    # Gauss-Legendre in cos(theta): exact for Legendre degree <= 2*lat-1
    ct, w_lat = np.polynomial.legendre.leggauss(lat)
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    phi = 2.0 * np.pi * np.arange(long) / long
    w_long = 2.0 * np.pi / long

    # grid points [lat, long, 3]
    x = st[:, None] * np.cos(phi)[None, :]
    y = st[:, None] * np.sin(phi)[None, :]
    z = np.broadcast_to(ct[:, None], x.shape)
    pts = np.stack([x, y, z], axis=-1)

    Y = real_sph_harm(lmax, pts)  # orthonormal; [lat, long, (lmax+1)^2]
    Y_comp = Y * np.sqrt(4.0 * np.pi)  # 'component' normalisation

    # keep only |m| <= mmax coefficients (truncated l-primary order)
    keep = []
    scale = []
    for l in range(lmax + 1):
        mm = min(l, mmax)
        for m in range(-mm, mm + 1):
            keep.append(l * l + (m + l))
            scale.append(
                np.sqrt((2 * l + 1) / (2 * mmax + 1)) if l > mmax else 1.0
            )
    keep = np.asarray(keep)
    scale = np.asarray(scale)

    to_grid = Y_comp[:, :, keep] * scale  # [lat, long, n_trunc]
    # quadrature inverse: from @ to = diag(scale^2) — identity for l <= mmax,
    # deliberate (2l+1)/(2mmax+1) amplification above, as in the reference.
    w = (w_lat[:, None] * w_long) / (4.0 * np.pi)
    from_grid = Y_comp[:, :, keep] * w[:, :, None] * scale

    return to_grid.astype(np.float32), from_grid.astype(np.float32)


class SO3Grid:
    """to/from grid transforms for one (lmax, mmax) resolution."""

    def __init__(self, lmax: int, mmax: int):
        self.lmax = lmax
        self.mmax = mmax
        to_g, from_g = _grid_mats(lmax, mmax)
        self.to_grid_mat = to_g
        self.from_grid_mat = from_g

    def to_grid(self, x: jax.Array) -> jax.Array:
        """[N, n_trunc, C] -> [N, lat, long, C]."""
        return jnp.einsum("bai,nic->nbac", jnp.asarray(self.to_grid_mat, x.dtype), x)

    def from_grid(self, g: jax.Array) -> jax.Array:
        """[N, lat, long, C] -> [N, n_trunc, C]."""
        return jnp.einsum(
            "bai,nbac->nic", jnp.asarray(self.from_grid_mat, g.dtype), g
        )


@functools.lru_cache(maxsize=None)
def get_grid(lmax: int, mmax: int) -> SO3Grid:
    return SO3Grid(lmax, mmax)
