"""Measure tpu.dynamic_gather throughput in Pallas at various table shapes.

axis=0: out[i,j] = x[idx[i,j], j]  (gather along sublanes, per-lane)
axis=1: out[i,j] = x[i, idx[i,j]]  (gather along lanes, per-sublane)
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 64  # gathers per kernel invocation (amortize call overhead)

def make_kernel(axis):
    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]
        idx = idx_ref[:]
        acc = jnp.zeros_like(idx)
        def body(k, carry):
            acc, idx = carry
            g = jnp.take_along_axis(tab, idx, axis=axis)
            return acc + g, (idx ^ g) & (tab.shape[axis] - 1)
        acc, idx = jax.lax.fori_loop(0, K, body, (acc, idx))
        out_ref[:] = acc + idx
    return kern

def run(R, C, axis):
    rng = np.random.default_rng(0)
    tab = rng.integers(0, max(2, (R if axis == 0 else C)), size=(R, C)).astype(np.int32)
    idx = rng.integers(0, R if axis == 0 else C, size=(R, C)).astype(np.int32)
    f = pl.pallas_call(
        make_kernel(axis),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(f)
    try:
        o = f(tab, idx); o.block_until_ready()
    except Exception as e:
        print(f"axis={axis} R={R:6d} C={C}  FAIL: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        o = f(tab, idx)
    o.block_until_ready()
    dt = (time.time() - t0) / reps
    n_lookups = R * C * K
    print(f"axis={axis} R={R:6d} C={C}  {dt*1e6/K:8.2f} us/gather  "
          f"{n_lookups/dt/1e9:8.2f} G lookups/s", flush=True)

if __name__ == "__main__":
    for R in (8, 32, 256, 512, 2048, 8192):
        run(R, 128, 0)
    for R in (8, 256, 2048):
        run(R, 128, 1)
    # wider arrays
    for C in (512, 2048):
        run(256, C, 0)
