"""Global compute-dtype policy (mixed precision).

Parameters and geometry (positions, distances, Euler angles) stay float32;
network compute runs in ``compute_dtype`` (default bfloat16 on TPU — the MXU's
native format). Modules read the policy at trace time via ``compute_dtype()``;
``set_compute_dtype`` switches it (before tracing/jit).
"""
from __future__ import annotations

import contextlib

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32


def compute_dtype():
    return _COMPUTE_DTYPE


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype) if not isinstance(dtype, str) else jnp.dtype(
        {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[dtype]
    )


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    set_compute_dtype(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev
