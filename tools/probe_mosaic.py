"""Probe which reshape/concat/transpose patterns Mosaic TPU accepts.

The fused SO2 edge-attention kernel (ops/pallas/so2_attn.py) needs layout
changes between the rotate chain ([TE, C, I] lane-contractions), the SO2
convolutions ([TE, I*C] flat-lane matmuls) and the S2 grid ([TE, I, H]).
Each candidate transition is compiled and executed here as a minimal kernel
on the real device; the results table drives the kernel design.

Run: python tools/probe_mosaic.py
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, in_shape, fn, out_shape, dtype=jnp.bfloat16):
    def kernel(x_ref, y_ref):
        y_ref[:] = fn(x_ref[:]).astype(y_ref.dtype)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=in_shape).astype(np.float32), dtype
    )
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
        )(x)
        ref = fn(x.astype(jnp.float32))
        ok = np.allclose(np.asarray(y, np.float32), np.asarray(ref, np.float32), atol=1e-2)
        print(f"{name:55s} OK   (values {'match' if ok else 'WRONG'})")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:90]
        print(f"{name:55s} FAIL {msg}")
        return False


def main():
    T = 16
    probe("T1 trailing merge [T,29,32]->[T,928]", (T, 29, 32), lambda x: x.reshape(T, 928), (T, 928))
    probe("T2 trailing split [T,896]->[T,7,128]", (T, 896), lambda x: x.reshape(T, 7, 128), (T, 7, 128))
    probe("T3 sublane concat 7+12+10 (lane 128)", (T, 7, 128), lambda x: jnp.concatenate([x, jnp.concatenate([x, x[:, :5]], axis=1)], axis=1), (T, 19, 128))
    probe("T4 transpose [T,128,29]->[T,29,128]", (T, 128, 29), lambda x: x.transpose(0, 2, 1), (T, 29, 128))
    probe("T4b transpose [T,29,32]->[T,32,29]", (T, 29, 32), lambda x: x.transpose(0, 2, 1), (T, 32, 29))
    probe("T5 trailing merge [T,29,128]->[T,3712]", (T, 29, 128), lambda x: x.reshape(T, 3712), (T, 3712))
    probe("T6 trailing split [T,784]->[T,7,112]", (T, 784), lambda x: x.reshape(T, 7, 112), (T, 7, 112))
    probe("T7 lane slice at 224 of 928", (T, 928), lambda x: jax.lax.slice(x, (0, 224), (T, 608)), (T, 384))
    probe("T8 lane concat 896+1536", (T, 896), lambda x: jnp.concatenate([x, jnp.concatenate([x, x[:, :640]], axis=1)], axis=1), (T, 3328))
    probe("T9 sublane gather const idx [T,29,128]", (T, 29, 128), lambda x: jnp.take(x, jnp.asarray(np.arange(28, -1, -1)), axis=1), (T, 29, 128))
    # dot_general patterns used by the rotate chain
    M = jnp.asarray(np.random.default_rng(1).normal(size=(49, 49)).astype(np.float32), jnp.bfloat16)

    def rot1(x):  # contract sublane dim: [T,49,32] x [49,49] -> [T,32,49]
        return jax.lax.dot_general(x, M, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    probe("T10 dot contract sublane [T,49,32]x[49,49]", (T, 49, 32), rot1, (T, 32, 49))

    M2 = jnp.asarray(np.random.default_rng(2).normal(size=(29, 49)).astype(np.float32), jnp.bfloat16)

    def rot2(x):  # contract lane dim: [T,32,49] x [29,49] -> [T,32,29]
        return jax.lax.dot_general(x, M2, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    probe("T11 dot contract lane [T,32,49]x[29,49]", (T, 32, 49), rot2, (T, 32, 29))


if __name__ == "__main__":
    main()
