"""Ground-truth timing: every measurement fetches a scalar to host."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
N = 1 << 24

def timeit(name, f, *args, reps=3):
    s = int(f(*args))          # warmup + compile, true host fetch
    t0 = time.time()
    for _ in range(reps):
        s = int(f(*args))
    dt = (time.time() - t0) / reps
    print(f"{name:46s} {dt*1e3:9.2f} ms  {N/dt/1e9:7.2f} G/s  [{s}]", flush=True)

# 0) pure elementwise baseline (no gather): sum of shifted adds
text = jnp.asarray(rng.integers(0, 4, size=N + 7).astype(np.uint8))
@jax.jit
def elemwise(text):
    t = text.astype(jnp.int32)
    w = jnp.zeros((N,), jnp.int32)
    for i in range(8):
        w = (w << 2) | jax.lax.dynamic_slice(t, (i,), (N,))
    return jnp.sum(w & 1, dtype=jnp.int32)
timeit("elementwise pack+sum (8 slices)", elemwise, text)

# 1) single 128-table take_along_axis over N
tab = jnp.asarray(rng.integers(0, 1 << 20, size=128).astype(np.int32))
idx = jnp.asarray(rng.integers(0, 128, size=N).astype(np.int32))
@jax.jit
def lookup1(tab, idx):
    idx2 = idx.reshape(-1, 128)
    tab2 = jnp.broadcast_to(tab[None, :], idx2.shape)
    v = jnp.take_along_axis(tab2, idx2, axis=1)
    return jnp.sum(v & 1, dtype=jnp.int32)
timeit("single 128-lookup + sum", lookup1, tab, idx)

# 2) 16-bank bitmap
bitmap = jnp.asarray(rng.integers(0, 1 << 31, size=(16, 128)).astype(np.int32))
w16 = jnp.asarray(rng.integers(0, 1 << 16, size=N).astype(np.int32))
@jax.jit
def bm16(bitmap, w16):
    lane2 = ((w16 >> 5) & 127).reshape(-1, 128)
    bank2 = (w16 >> 12).reshape(-1, 128)
    acc = jnp.zeros_like(lane2)
    for b in range(16):
        tab2 = jnp.broadcast_to(bitmap[b][None, :], lane2.shape)
        v = jnp.take_along_axis(tab2, lane2, axis=1)
        acc = jnp.where(bank2 == b, v, acc)
    hit = (acc.reshape(-1) >> (w16 & 31)) & 1
    return jnp.sum(hit, dtype=jnp.int32)
timeit("16-bank bitmap membership + sum", bm16, bitmap, w16)

# 3) 2-bank variant (cost scaling with banks)
@jax.jit
def bm2(bitmap, w16):
    lane2 = ((w16 >> 5) & 127).reshape(-1, 128)
    bank2 = ((w16 >> 12) & 1).reshape(-1, 128)
    acc = jnp.zeros_like(lane2)
    for b in range(2):
        tab2 = jnp.broadcast_to(bitmap[b][None, :], lane2.shape)
        v = jnp.take_along_axis(tab2, lane2, axis=1)
        acc = jnp.where(bank2 == b, v, acc)
    hit = (acc.reshape(-1) >> (w16 & 31)) & 1
    return jnp.sum(hit, dtype=jnp.int32)
timeit("2-bank bitmap membership + sum", bm2, bitmap, w16)

# 4) the dyngather2-style chain, but truly blocked
R, C = 256, 128
tabc = jnp.asarray(rng.integers(0, C, size=(R, C)).astype(np.int32))
idxc = jnp.asarray(rng.integers(0, C, size=(R, C)).astype(np.int32))
K = 64
@jax.jit
def chain(tab, idx):
    def body(k, idx):
        return (jnp.take_along_axis(tab, idx, axis=1) + 1) & (C - 1)
    return jnp.sum(jax.lax.fori_loop(0, K, body, idx), dtype=jnp.int32)
s = int(chain(tabc, idxc))
t0 = time.time()
for _ in range(50):
    s = int(chain(tabc, idxc))
dt = (time.time() - t0) / 50
print(f"{'chain64 (R=256) per-gather':46s} {dt*1e6/K:9.2f} us  {R*C*K/dt/1e9:7.2f} G lookups/s  [{s}]", flush=True)
