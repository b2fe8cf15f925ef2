"""Extended dynamic_gather probes: dtypes, ILP, per-row tables, R sweep."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 64

def bench(name, kern, args, out_shape, lookups):
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        o = f(*args); o.block_until_ready()
    except Exception as e:
        print(f"{name:36s} FAIL: {type(e).__name__}: {str(e)[:100]}", flush=True)
        return
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        o = f(*args)
    o.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{name:36s} {dt*1e6/K:9.2f} us/iter  {lookups*K/dt/1e9:8.2f} G lookups/s", flush=True)

rng = np.random.default_rng(0)

# 1) dtype sweep, axis=1, single chain, R=256
for dt_ in (np.int32, np.uint16, np.uint8):
    R, C = 256, 128
    tab = rng.integers(0, C, size=(R, C)).astype(dt_)
    idx = rng.integers(0, C, size=(R, C)).astype(dt_)
    def kern(tab_ref, idx_ref, out_ref):
        tab, idx = tab_ref[:], idx_ref[:]
        acc = jnp.zeros_like(idx)
        def body(k, c):
            acc, idx = c
            g = jnp.take_along_axis(tab, idx, axis=1)
            return acc + g, (idx ^ g) & (C - 1)
        acc, idx = jax.lax.fori_loop(0, K, body, (acc, idx))
        out_ref[:] = acc + idx
    bench(f"axis1 chain dtype={np.dtype(dt_).name} R={R}", kern, (tab, idx),
          jax.ShapeDtypeStruct((R, C), dt_), R * C)

# 2) independent gathers (ILP): 4 chains in one loop, int32
R, C = 256, 128
tab = rng.integers(0, C, size=(R, C)).astype(np.int32)
idxs = [rng.integers(0, C, size=(R, C)).astype(np.int32) for _ in range(4)]
def kern_ilp(tab_ref, i0, i1, i2, i3, out_ref):
    tab = tab_ref[:]
    st = [i0[:], i1[:], i2[:], i3[:]]
    def body(k, st):
        return tuple((jnp.take_along_axis(tab, s, axis=1) + 1) & (C - 1) for s in st)
    st = jax.lax.fori_loop(0, K, body, tuple(st))
    out_ref[:] = st[0] + st[1] + st[2] + st[3]
bench("axis1 ILPx4 int32 R=256", kern_ilp, (tab, *idxs),
      jax.ShapeDtypeStruct((R, C), jnp.int32), 4 * R * C)

# 3) R sweep for axis=1 int32 (throughput shape dependence)
for R in (8, 64, 512, 1024):
    C = 128
    tab = rng.integers(0, C, size=(R, C)).astype(np.int32)
    idx = rng.integers(0, C, size=(R, C)).astype(np.int32)
    def kern_r(tab_ref, idx_ref, out_ref):
        tab, idx = tab_ref[:], idx_ref[:]
        def body(k, idx):
            return (jnp.take_along_axis(tab, idx, axis=1) + 1) & (C - 1)
        out_ref[:] = jax.lax.fori_loop(0, K, body, idx)
    bench(f"axis1 chain int32 R={R}", kern_r, (tab, idx),
          jax.ShapeDtypeStruct((R, C), jnp.int32), R * C)

# 4) axis=0 int8: taller sublane tables?
for R in (8, 16, 32):
    C = 128
    tab = rng.integers(0, R, size=(R, C)).astype(np.int8)
    idx = rng.integers(0, R, size=(R, C)).astype(np.int8)
    def kern_a0(tab_ref, idx_ref, out_ref):
        tab, idx = tab_ref[:], idx_ref[:]
        def body(k, idx):
            g = jnp.take_along_axis(tab, idx, axis=0)
            return (g + 1) % R
        out_ref[:] = jax.lax.fori_loop(0, K, body, idx)
    bench(f"axis0 chain int8 R={R}", kern_a0, (tab, idx),
          jax.ShapeDtypeStruct((R, C), jnp.int8), R * C)

# 5) XLA (non-pallas) take_along_axis for comparison
R, C = 256, 128
tab = jnp.asarray(rng.integers(0, C, size=(R, C)).astype(np.int32))
idx = jnp.asarray(rng.integers(0, C, size=(R, C)).astype(np.int32))
@jax.jit
def xla_chain(tab, idx):
    def body(k, idx):
        return (jnp.take_along_axis(tab, idx, axis=1) + 1) & (C - 1)
    return jax.lax.fori_loop(0, K, body, idx)
o = xla_chain(tab, idx); o.block_until_ready()
t0 = time.time()
for _ in range(20): o = xla_chain(tab, idx)
o.block_until_ready()
dt = (time.time() - t0) / 20
print(f"{'XLA take_along_axis chain R=256':36s} {dt*1e6/K:9.2f} us/iter  {R*C*K/dt/1e9:8.2f} G lookups/s")
