"""Validate + scale-test the exact window-id bitmap count (DNA m=8)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen

ab = Alphabet.dna()


def build_bitmap(pats):
    """(16,128) int32 bitmap over 2-bit-packed window ids (big-endian chars)."""
    w = np.zeros(len(pats), np.int64)
    for i in range(8):
        w = (w << 2) | pats[:, i]
    bitmap = np.zeros(2048, np.uint32)
    np.bitwise_or.at(bitmap, w >> 5, np.uint32(1) << (w & 31).astype(np.uint32))
    return jnp.asarray(bitmap.reshape(16, 128).astype(np.int32))


def make_count(n):
    @jax.jit
    def count(bitmap, text):
        N = n - 7
        t = text.astype(jnp.int32)
        w = jnp.zeros((N,), jnp.int32)
        for i in range(8):
            w = (w << 2) | jax.lax.dynamic_slice(t, (i,), (N,))
        lane = (w >> 5) & 127
        bank = w >> 12
        bit = w & 31
        lane2 = lane.reshape(-1, 128)
        bank2 = bank.reshape(-1, 128)
        acc = jnp.zeros_like(lane2)
        for b in range(16):
            tab2 = jnp.broadcast_to(bitmap[b][None, :], lane2.shape)
            v = jnp.take_along_axis(tab2, lane2, axis=1)
            acc = jnp.where(bank2 == b, v, acc)
        hit = (acc.reshape(-1) >> bit) & 1
        return jnp.sum(hit, dtype=jnp.int32)
    return count

# correctness at moderate scale
n = (1 << 22) + 7
text = datagen.generate_text(n, ab, seed=1)
pats = datagen.generate_patterns(text, 1000, 8, ab, seed=2)
truth = datagen.count_matches(text, pats)
bm = build_bitmap(pats.codes)
cnt = make_count(n)
c = int(cnt(bm, jnp.asarray(text)))
print(f"n={n} truth={truth} got={c}", "OK" if c == truth else "MISMATCH", flush=True)

# throughput sweep
for logn in (24, 26, 27):
    n = (1 << logn) + 7
    text = datagen.generate_text(n, ab, seed=3)
    tdev = jax.device_put(jnp.asarray(text))
    cnt = make_count(n)
    o = cnt(bm, tdev); o.block_until_ready()
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        o = cnt(bm, tdev)
    o.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"n=2^{logn}: {dt*1e3:8.3f} ms  {n/dt/1e9:8.2f} GB/s  count={int(o)}", flush=True)
