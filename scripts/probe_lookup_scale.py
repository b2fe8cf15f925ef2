"""At-scale probes for the banked take_along_axis lookup strategy."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

N = 1 << 24   # 16M positions

rng = np.random.default_rng(0)


def timeit(name, f, *args, reps=5):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms   {N/dt/1e9:7.2f} G pos/s", flush=True)
    return dt


# 1) single 128-table lookup over N positions (broadcast table)
tab = jnp.asarray(rng.integers(0, 1 << 30, size=128).astype(np.int32))
idx = jnp.asarray(rng.integers(0, 128, size=N).astype(np.int32))

@jax.jit
def lookup1(tab, idx):
    idx2 = idx.reshape(-1, 128)
    tab2 = jnp.broadcast_to(tab[None, :], idx2.shape)
    return jnp.take_along_axis(tab2, idx2, axis=1).reshape(-1)

timeit("single 128-lookup (broadcast)", lookup1, tab, idx)

# 2) 16-bank bitmap lookup (the exact-16bit window membership)
bitmap = jnp.asarray(rng.integers(0, 1 << 31, size=(16, 128)).astype(np.int32))
w16 = jnp.asarray(rng.integers(0, 1 << 16, size=N).astype(np.int32))

@jax.jit
def bitmap16(bitmap, w16):
    lane = (w16 >> 5) & 127
    bank = w16 >> 12
    bit = w16 & 31
    lane2 = lane.reshape(-1, 128)
    acc = jnp.zeros_like(lane2)
    for b in range(16):
        tab2 = jnp.broadcast_to(bitmap[b][None, :], lane2.shape)
        v = jnp.take_along_axis(tab2, lane2, axis=1)
        acc = jnp.where(bank.reshape(-1, 128) == b, v, acc)
    hit = (acc.reshape(-1) >> bit) & 1
    return jnp.sum(hit, dtype=jnp.int32)

timeit("16-bank 64Kbit bitmap membership", bitmap16, bitmap, w16)

# 3) full DNA m=8 exact count: pack window16 from bytes + bitmap
text = jnp.asarray(rng.integers(0, 4, size=N + 7).astype(np.uint8))

@jax.jit
def dna8_count(bitmap, text):
    t = text.astype(jnp.int32)
    w = jnp.zeros((N,), jnp.int32)
    for i in range(8):
        w = (w << 2) | jax.lax.dynamic_slice(t, (i,), (N,))
    lane = (w >> 5) & 127
    bank = w >> 12
    bit = w & 31
    lane2 = lane.reshape(-1, 128)
    acc = jnp.zeros_like(lane2)
    for b in range(16):
        tab2 = jnp.broadcast_to(bitmap[b][None, :], lane2.shape)
        v = jnp.take_along_axis(tab2, lane2, axis=1)
        acc = jnp.where(bank.reshape(-1, 128) == b, v, acc)
    hit = (acc.reshape(-1) >> bit) & 1
    return jnp.sum(hit, dtype=jnp.int32)

timeit("DNA m=8 exact count end-to-end", dna8_count, bitmap, text)

# 4) nonzero compaction cost at this scale
cand = jnp.asarray((rng.random(N) < 0.01))

@jax.jit
def compact(cand):
    return jnp.nonzero(cand, size=1 << 18, fill_value=N)[0]

timeit("nonzero compaction (1% cand, cap 256k)", compact, cand)

# 5) poly fingerprint (m=32) + bitmap — the general-alphabet path
text20 = jnp.asarray(rng.integers(0, 20, size=N + 31).astype(np.uint8))

@jax.jit
def fp_count(bitmap, text20):
    t = text20.astype(jnp.int32)
    R = 0x9E37
    fp = jnp.zeros((N,), jnp.int32)
    rp = 1
    for i in range(32):
        fp = (fp + jax.lax.dynamic_slice(t, (i,), (N,)) * rp) & 0xFFFF
        rp = (rp * R) & 0xFFFF
    lane = (fp >> 5) & 127
    bank = fp >> 12
    bit = fp & 31
    lane2 = lane.reshape(-1, 128)
    acc = jnp.zeros_like(lane2)
    for b in range(16):
        tab2 = jnp.broadcast_to(bitmap[b][None, :], lane2.shape)
        v = jnp.take_along_axis(tab2, lane2, axis=1)
        acc = jnp.where(bank.reshape(-1, 128) == b, v, acc)
    hit = (acc.reshape(-1) >> bit) & 1
    return jnp.sum(hit, dtype=jnp.int32)

timeit("fp16 (m=32, sigma=20) + bitmap count", fp_count, bitmap, text20)
