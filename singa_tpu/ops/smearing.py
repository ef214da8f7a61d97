"""Radial basis expansions of interatomic distances.

Equivalent of the reference's GaussianSmearing variants
(/root/reference/model/EF_layers.py:1777-1794, model/CProMG.py:467-477).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def gaussian_smearing(
    dist: jax.Array,
    start: float = 0.0,
    stop: float = 10.0,
    num_gaussians: int = 50,
    basis_width_scalar: float = 1.0,
) -> jax.Array:
    """Expand distances ``[...,]`` into Gaussian RBFs ``[..., num_gaussians]``."""
    offset = jnp.linspace(start, stop, num_gaussians, dtype=dist.dtype)
    width = basis_width_scalar * (stop - start) / (num_gaussians - 1)
    coeff = -0.5 / (width * width)
    diff = dist[..., None] - offset
    return jnp.exp(coeff * diff * diff)


@dataclasses.dataclass(frozen=True)
class GaussianSmearing:
    start: float = 0.0
    stop: float = 10.0
    num_gaussians: int = 50
    basis_width_scalar: float = 1.0

    @property
    def num_output(self) -> int:
        return self.num_gaussians

    def __call__(self, dist: jax.Array) -> jax.Array:
        return gaussian_smearing(
            dist, self.start, self.stop, self.num_gaussians, self.basis_width_scalar
        )


def sigmoid_smearing(
    dist: jax.Array,
    start: float = -5.0,
    stop: float = 5.0,
    num_sigmoid: int = 50,
    basis_width_scalar: float = 1.0,
) -> jax.Array:
    """Sigmoid basis (reference EF_layers.py:1797-1814)."""
    offset = jnp.linspace(start, stop, num_sigmoid, dtype=dist.dtype)
    coeff = basis_width_scalar / ((stop - start) / (num_sigmoid - 1))
    return jax.nn.sigmoid(coeff * (dist[..., None] - offset))


def linear_sigmoid_smearing(
    dist: jax.Array,
    start: float = -5.0,
    stop: float = 5.0,
    num_sigmoid: int = 50,
    basis_width_scalar: float = 1.0,
) -> jax.Array:
    """Sigmoid + linear leak basis (reference EF_layers.py:1817-1836)."""
    offset = jnp.linspace(start, stop, num_sigmoid, dtype=dist.dtype)
    coeff = basis_width_scalar / ((stop - start) / (num_sigmoid - 1))
    x = coeff * (dist[..., None] - offset)
    return jax.nn.sigmoid(x) + 0.001 * x
