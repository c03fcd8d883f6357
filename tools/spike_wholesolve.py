"""Spike: Mosaic/interpret support for the whole-solve kernel building blocks."""
import sys
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = jax.default_backend() == "cpu"
MAXS, B, D = 16, 32, 20
DP = 128  # history feature dim padded to the lane tile for DMA alignment

def kernel(t0r, y0r, y1r, telr, hyr, cpy, sem):
    t0 = t0r[0, 0]

    def zero_body(i, _):
        telr[i, 0] = 0.0
        return 0
    jax.lax.fori_loop(0, MAXS, zero_body, 0)

    def cond(c):
        i, t, y = c
        return (i < MAXS) & (t < 1.0)

    def body(c):
        i, t, y = c
        # dynamic scalar store to SMEM output
        telr[i, 0] = t
        # DMA VMEM scratch -> ANY history row (lane-padded)
        cpy[:, :D] = y
        dma = pltpu.make_async_copy(cpy, hyr.at[i], sem.at[0])
        dma.start()
        y2 = jnp.tanh(y + 0.1 * t)
        # small vjp inside the loop
        _, vjp = jax.vjp(lambda yy: jnp.tanh(yy * 0.5), y2)
        (g,) = vjp(y2 * 0.01)
        dma.wait()
        return (i + 1, t + 0.25, y2 + g)

    i, t, y = jax.lax.while_loop(cond, body, (0, t0, y0r[:]))
    y1r[:] = y

@jax.jit
def run(t0, y0):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((B, D), jnp.float32),
                   jax.ShapeDtypeStruct((MAXS, 1), jnp.float32),
                   jax.ShapeDtypeStruct((MAXS, B, DP), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((B, DP), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=INTERP,
    )(jnp.reshape(jnp.float32(t0), (1, 1)), y0)

y0 = jax.random.normal(jax.random.PRNGKey(0), (B, D))
y1, tel, hy = run(0.0, y0)
print("y1", np.asarray(y1)[0, :3], "tel", np.asarray(tel).ravel()[:6])
print("hy row0 == y0:", np.allclose(np.asarray(hy)[0][:, :D], np.asarray(y0)))
print("hy row1 finite:", np.isfinite(np.asarray(hy)[1]).all())
print("SPIKE OK on", jax.default_backend())
