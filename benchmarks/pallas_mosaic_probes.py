"""Mosaic capability probes for this environment's TPU (verified 2026-08-18).

Earlier (2026-08-17) even trivial compiled Pallas kernels hung in the axon
remote-compile tunnel; that is fixed — compiled Mosaic now works.  These
probes established what the kernels may use.  IMPORTANT: faults are only
surfaced on a host transfer (np.asarray) — `block_until_ready` returns
success even when the kernel crashed the worker, so every probe must fetch
a value.

Findings:
  OK   grid + blocked 2-D/1-D VMEM in/out specs
  OK   pltpu.ANY input + manual make_async_copy DMA, dynamic row offsets
  OK   sublane-unaligned *reads* of VMEM scratch (s[p:p+B, :], any p)
  OK   1-D (B,)-blocked f32 outputs, row reduces
  CRASH  DMA row counts that are not multiples of 8 (e.g. copying
         B+P-1 = 1034 rows): kills the TPU worker process.  Round DMA
         windows up to 8 rows and pad the source accordingly
         (kernels/fir_pallas.py).

Run any probe:  timeout 300 python benchmarks/pallas_mosaic_probes.py W4
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "W4"

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = {"which": which}
    if which == "W4":  # ANY + DMA + grid with dynamic offset (OK)
        B = 1024

        def k(x_ref, o_ref, s, sem):
            g = pl.program_id(0)
            cp = pltpu.make_async_copy(x_ref.at[pl.ds(g * B, B), :], s, sem)
            cp.start()
            cp.wait()
            o_ref[...] = s[...] + 1.0

        x = jnp.ones((4 * B, 128), jnp.float32)
        y = pl.pallas_call(
            k,
            grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((B, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4 * B, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, 128), jnp.float32), pltpu.SemaphoreType.DMA],
        )(x)
        out["v"] = float(np.asarray(y)[0, 0])
    elif which == "X1":  # unaligned (1034-row) DMA window (CRASHES the worker)
        B, P, G = 1024, 11, 4
        ROWS = B + P - 1

        def k(x_ref, o_ref, s, sem):
            g = pl.program_id(0)
            cp = pltpu.make_async_copy(x_ref.at[pl.ds(g * B, ROWS), :], s, sem)
            cp.start()
            cp.wait()
            o_ref[...] = s[0:B, :] * 2.0

        x = jnp.ones((G * B + P - 1, 128), jnp.float32)
        y = pl.pallas_call(
            k,
            grid=(G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((B, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * B, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((ROWS, 128), jnp.float32), pltpu.SemaphoreType.DMA],
        )(x)
        out["v"] = float(np.asarray(y)[0, 0])
    elif which == "X2":  # sublane-unaligned shifted VMEM reads (OK)
        B, P = 1024, 11
        ROWS = B + P - 1

        def k(x_ref, o_ref):
            a = x_ref[0:B, :]
            for p in range(1, P):
                a = a + x_ref[p : p + B, :]
            o_ref[...] = a

        x = jnp.ones((ROWS, 128), jnp.float32)
        y = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        )(x)
        out["v"] = float(np.asarray(y)[0, 0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
