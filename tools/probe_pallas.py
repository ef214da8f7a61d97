"""Probe: does a minimal Mosaic/Pallas kernel compile+run on this TPU path?

Round-1 finding: the axon remote-compile helper stalled indefinitely on any
Mosaic kernel. Re-test each round; run under `timeout 120`.
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0


@jax.jit
def f(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    x = jnp.ones((256, 256), jnp.float32)
    t0 = time.time()
    y = f(x)
    val = float(y[0, 0])
    print(f"PALLAS OK in {time.time()-t0:.1f}s, y[0,0]={val}")


if __name__ == "__main__":
    main()
