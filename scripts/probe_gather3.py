"""Honest dynamic_gather microbenchmarks: R sweep, ILP, dtype width.
All timings subtract the measured dispatch overhead and block via int()."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

# measure dispatch overhead
@jax.jit
def triv(x): return x + 1
x0 = jnp.int32(1)
int(triv(x0))
t0 = time.time()
for _ in range(20): int(triv(x0))
OVH = (time.time() - t0) / 20
print(f"dispatch overhead: {OVH*1e3:.2f} ms", flush=True)

def bench(name, R, C, K, n_ilp, reps=3):
    tabs = [rng.integers(0, C, size=(R, C)).astype(np.int32) for _ in range(1)]
    idxs = [rng.integers(0, C, size=(R, C)).astype(np.int32) for _ in range(n_ilp)]
    def kern(*refs):
        tab = refs[0][:]
        states = [r[:] for r in refs[1:1 + n_ilp]]
        out_ref = refs[-1]
        def body(k, states):
            return tuple((jnp.take_along_axis(tab, s, axis=1) + 1) & (C - 1)
                         for s in states)
        states = jax.lax.fori_loop(0, K, body, tuple(states))
        acc = states[0]
        for s in states[1:]:
            acc = acc + s
        out_ref[:] = acc
    pf = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_ilp),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    @jax.jit
    def run(*a):
        return jnp.sum(pf(*a), dtype=jnp.int32)
    args = [jnp.asarray(tabs[0])] + [jnp.asarray(i) for i in idxs]
    try:
        s = int(run(*args))
    except Exception as e:
        print(f"{name:34s} FAIL {type(e).__name__} {str(e)[:80]}", flush=True)
        return
    t0 = time.time()
    for _ in range(reps):
        s = int(run(*args))
    dt = (time.time() - t0) / reps - OVH
    dt = max(dt, 1e-9)
    total = R * C * K * n_ilp
    per_op = dt / (K * n_ilp)
    print(f"{name:34s} {per_op*1e6:8.2f} us/op  {total/dt/1e9:7.2f} G lookups/s", flush=True)

# R sweep, single chain (latency-bound)
for R in (8, 64, 256, 1024):
    bench(f"chain R={R}", R, 128, 2048 if R <= 64 else 512, 1)
# ILP sweep at R=256
for ilp in (2, 4, 8):
    bench(f"ILPx{ilp} R=256", 256, 128, 512, ilp)
# ILP at R=8 (minimal op)
bench("ILPx8 R=8", 8, 128, 4096, 8)
bench("ILPx4 R=1024", 1024, 128, 256, 4)
