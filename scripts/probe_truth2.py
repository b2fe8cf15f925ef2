"""Separate per-call overhead from streaming throughput; re-time Pallas
dynamic_gather with honest scalar-fetch blocking."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

def bench_scalar(name, f, args, work, reps=5):
    s = int(f(*args))
    t0 = time.time()
    for _ in range(reps):
        s = int(f(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms  {work/dt/1e9:8.2f} G/s  [{s}]", flush=True)
    return dt

# A) dispatch overhead: trivial scalar op
x = jnp.float32(1.0)
@jax.jit
def triv(x): return x + 1
bench_scalar("trivial scalar op (dispatch+fetch overhead)", triv, (x,), 1, reps=20)

# B) elementwise streaming at 3 sizes
for logn in (22, 24, 26):
    N = 1 << logn
    text = jnp.asarray(rng.integers(0, 4, size=N + 7).astype(np.uint8))
    def make(N):
        @jax.jit
        def ew(text):
            t = text.astype(jnp.int32)
            w = jnp.zeros((N,), jnp.int32)
            for i in range(8):
                w = (w << 2) | jax.lax.dynamic_slice(t, (i,), (N,))
            return jnp.sum(w & 1, dtype=jnp.int32)
        return ew
    bench_scalar(f"elementwise pack+sum N=2^{logn}", make(N), (text,), N)

# C) Pallas dynamic_gather chain, scalar-blocked, bigger work per call
R, C, K = 512, 128, 512
tab = rng.integers(0, C, size=(R, C)).astype(np.int32)
idx = rng.integers(0, C, size=(R, C)).astype(np.int32)
def kern(tab_ref, idx_ref, out_ref):
    tab, idx = tab_ref[:], idx_ref[:]
    def body(k, idx):
        return (jnp.take_along_axis(tab, idx, axis=1) + 1) & (C - 1)
    out_ref[:] = jax.lax.fori_loop(0, K, body, idx)
pf = jax.jit(pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
))
@jax.jit
def chain_sum(tab, idx):
    return jnp.sum(pf(tab, idx), dtype=jnp.int32)
dt = bench_scalar(f"pallas dyngather chain K={K} R={R}", chain_sum,
                  (jnp.asarray(tab), jnp.asarray(idx)), R * C * K)
print(f"  -> per gather op: {dt*1e6/K:.3f} us; {R*C*K/dt/1e9:.2f} G lookups/s", flush=True)

# D) Pallas elementwise throughput kernel (streaming): grid over tiles
N = 1 << 26
textb = rng.integers(0, 4, size=N).astype(np.uint8).reshape(-1, 512)  # (131072, 512)
TM = 1024
def ew_kern(x_ref, out_ref):
    t = x_ref[:].astype(jnp.int32)
    acc = (t << 2) ^ (t + 1)
    out_ref[0, 0] = jnp.sum(acc, dtype=jnp.int32)
pe = jax.jit(pl.pallas_call(
    ew_kern,
    grid=(textb.shape[0] // TM,),
    in_specs=[pl.BlockSpec((TM, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
))
@jax.jit
def pe_sum(x):
    return pe(x)[0, 0]
bench_scalar(f"pallas elementwise stream N=2^26 (uint8)", pe_sum,
             (jnp.asarray(textb),), N)
