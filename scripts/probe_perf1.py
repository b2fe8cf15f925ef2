"""Where does exact-tier scan time go? Layout vs kernel vs bank count."""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.ops.fast import build_fast
from tpu_smatcher.ops import pallas_filter as pf
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n = 1 << 28
ab = Alphabet.dna()
text = datagen.generate_text(n, ab, seed=7)
pats = datagen.generate_patterns(text, 10_000, 8, ab, frac_present=0.5, seed=8)
ft = build_fast(pats.codes, pats.sigma)
tdev = jax.device_put(jnp.asarray(text))
m, sigma = 8, 4


def bench(f, *a, reps=5):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# 1. full path
t = bench(functools.partial(pf.exact_count_pallas, m=m, sigma=sigma, n=n), tdev, ft.bitmaps[0])
print(f"full exact_count_pallas: {t*1e3:.1f}ms  {n/t/1e9:.2f} GB/s")

# 2. layout alone
lay = jax.jit(functools.partial(pf.overlap_rows, n=n, m=m))
t = bench(lambda x: lay(x)[0], tdev)
print(f"overlap_rows alone:      {t*1e3:.1f}ms")

# 3. kernel alone on prebuilt layout
tile, n_starts = jax.jit(functools.partial(pf.overlap_rows, n=n, m=m))(tdev)
tile = jax.block_until_ready(tile)
rb = pf.DEFAULT_RB
R = tile.shape[0]
kern = functools.partial(pf._exact_kernel, m=m, bits=2, n_starts=n_starts, rb=rb)
run = jax.jit(lambda tl, bm: pl.pallas_call(
    kern, grid=(R // rb,),
    in_specs=[pl.BlockSpec((rb, pf.ROW_BYTES), lambda i: (i, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(tl, bm))
t = bench(run, tile, ft.bitmaps[0])
print(f"kernel on prebuilt tile: {t*1e3:.1f}ms  {n/t/1e9:.2f} GB/s")

# 4. kernel with only K banks (lower bound scaling in bank count)
for K in (1, 4, 8):
    def kern_k(tile_ref, bitmap_ref, out_ref, *, K=K):
        t32 = tile_ref[:].astype(jnp.int32)
        keys = pf._wid_keys_2d(t32, m, 2)
        lane = (keys >> 5) & 127
        bank = keys >> 12
        acc = jnp.zeros_like(lane)
        for b in range(K):
            tab = jnp.broadcast_to(bitmap_ref[b][None, :], (rb, 128))
            v = jnp.take_along_axis(tab, lane, axis=1)
            acc = jnp.where(bank == b, v, acc)
        hit = (acc >> (keys & 31)) & 1
        hit = jnp.where(pf._window_positions(rb) < n_starts, hit, 0)
        s = jnp.sum(hit, dtype=jnp.int32)
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[0, 0] = 0
        out_ref[0, 0] += s
    runk = jax.jit(lambda tl, bm, kk=kern_k: pl.pallas_call(
        kk, grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, pf.ROW_BYTES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(tl, bm))
    t = bench(runk, tile, ft.bitmaps[0])
    print(f"kernel {K:2d} banks:         {t*1e3:.1f}ms  {n/t/1e9:.2f} GB/s")

# 5. keys only (no bitmap test): upper bound without gathers
def kern_keys(tile_ref, bitmap_ref, out_ref):
    t32 = tile_ref[:].astype(jnp.int32)
    keys = pf._wid_keys_2d(t32, m, 2)
    hit = jnp.where(pf._window_positions(rb) < n_starts, keys & 1, 0)
    s = jnp.sum(hit, dtype=jnp.int32)
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0
    out_ref[0, 0] += s
runk = jax.jit(lambda tl, bm: pl.pallas_call(
    kern_keys, grid=(R // rb,),
    in_specs=[pl.BlockSpec((rb, pf.ROW_BYTES), lambda i: (i, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(tl, bm))
t = bench(runk, tile, ft.bitmaps[0])
print(f"keys only (no gather):   {t*1e3:.1f}ms  {n/t/1e9:.2f} GB/s")
