"""Probe: exact-tier layout overhead (DNA m=8 p=10k, 256 MiB).

The current pipeline materializes overlap_rows' (R, 256) concat in HBM —
a 2n-byte write + read on top of the n-byte pad copy.  Variants:

A  exact_count_pallas as shipped (pad copy + concat + kernel)
L  overlap_rows alone (the layout cost)
K  kernel only (tile pre-built)
C  two-view: view0 = free reshape of padded, view1 = one 128-byte-shifted
   slice copy (n bytes instead of the 2n concat); kernel takes two (rb,128)
   refs and splits the wid matmul across them (same FLOPs)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.ops.fast import build_fast, _bits_per_char
from tpu_smatcher.ops import pallas_filter as pf

LANES = 128
N = 1 << 28
M = 8
RB = pf.EXACT_RB


def timeit(fn, fetch, reps=4, queue=8):
    best = None
    for _ in range(reps):
        t0 = time.time()
        outs = [fn() for _ in range(queue)]
        fetch(outs[-1])
        t_many = time.time() - t0
        t0 = time.time()
        fetch(fn())
        t_one = time.time() - t0
        dt = (t_many - t_one) / (queue - 1)
        best = dt if best is None else min(best, dt)
    return best


def _kernel2(a_ref, b_ref, bitmap_ref, w_ref, out_ref, *, n_starts, rb):
    a = a_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    b = b_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    # W rows: [0,128) lo bytes of ctx 0-127, [128,256) lo of 128-255,
    # [256,384) hi of 0-127, [384,512) hi of 128-255
    lo = (jnp.dot(a, w_ref[0:128], preferred_element_type=jnp.float32)
          + jnp.dot(b, w_ref[128:256], preferred_element_type=jnp.float32))
    hi = (jnp.dot(a, w_ref[256:384], preferred_element_type=jnp.float32)
          + jnp.dot(b, w_ref[384:512], preferred_element_type=jnp.float32))
    keys = (lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 8)) & 0xFFFF
    hit = pf._bitmap_lookup(bitmap_ref, keys, rb)
    hit = jnp.where(pf._window_positions(rb) < n_starts, hit, 0)
    s = jnp.sum(hit, dtype=jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0

    out_ref[0, 0] += s


@functools.partial(jax.jit, static_argnames=("m", "sigma", "n", "rb"))
def exact_count_2view(text, bitmap, *, m, sigma, n, rb=RB):
    n_starts = max(0, n - m + 1)
    R = max(1, -(-n_starts // LANES))
    R = -(-R // rb) * rb
    flat_len = R * LANES + LANES
    padded = jnp.zeros((flat_len,), jnp.uint8).at[:n].set(text[:n])
    v0 = padded[:R * LANES].reshape(R, LANES)
    v1 = padded[LANES:R * LANES + LANES].reshape(R, LANES)
    bits = _bits_per_char(sigma)
    w = pf.wid_weights(m, bits)
    kern = functools.partial(_kernel2, n_starts=n_starts, rb=rb)
    out = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bitmap.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(v0, v1, bitmap, w)
    return out[0, 0]


def main():
    ab = Alphabet.dna()
    text = datagen.generate_text(N, ab, seed=7)
    pats = datagen.generate_patterns(text, 10_000, M, ab, frac_present=0.5,
                                     seed=8)
    ft = build_fast(pats.codes, pats.sigma)
    bitmap = jnp.asarray(ft.bitmaps[0])
    tdev = jax.device_put(jnp.asarray(text))

    # ground truth on a prefix
    nn = 1 << 22
    truth = datagen.count_matches(text[:nn], pats)
    got = int(exact_count_2view(tdev[:nn], bitmap, m=M, sigma=4, n=nn))
    print("2view parity:", got, truth, "OK" if got == truth else "FAIL")

    # A: shipped pipeline
    fA = lambda: pf.exact_count_pallas(tdev, bitmap, m=M, sigma=4, n=N)
    print("A shipped     :", timeit(fA, lambda o: int(o)) * 1e3, "ms")

    # L: layout alone
    layout = jax.jit(lambda t: pf.overlap_rows(t, N, M, RB)[0])
    print("L layout      :", timeit(lambda: layout(tdev),
                                    lambda o: int(o[0, 0])) * 1e3, "ms")

    # K: kernel only (pre-built tile)
    tile, n_starts = jax.jit(lambda t: pf.overlap_rows(t, N, M, RB))(tdev)
    tile = jax.block_until_ready(tile)
    n_starts = int(n_starts)
    bits = _bits_per_char(4)
    w = pf.wid_weights(M, bits)
    R = tile.shape[0]
    kern = functools.partial(pf._exact_kernel, m=M, bits=bits, sigma=4,
                             n_starts=n_starts, rb=RB, guard=False)
    kcall = jax.jit(lambda tl: pl.pallas_call(
        kern,
        grid=(R // RB,),
        in_specs=[
            pl.BlockSpec((RB, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bitmap.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(tl, bitmap, jnp.asarray(w))[0, 0])
    print("K kernel only :", timeit(lambda: kcall(tile),
                                    lambda o: int(o)) * 1e3, "ms")

    # C: two-view end-to-end
    fC = lambda: exact_count_2view(tdev, bitmap, m=M, sigma=4, n=N)
    cC = int(fC())
    cA = int(fA())
    print("counts:", cA, cC, "OK" if cA == cC else "FAIL")
    print("C two-view    :", timeit(fC, lambda o: int(o)) * 1e3, "ms")


if __name__ == "__main__":
    main()


def _kernel_roll(a_ref, edge_ref, bitmap_ref, w_ref, out_ref, *, n_starts, rb):
    """One (rb,128) block + the single following row; the second 128-byte
    context view comes from an in-kernel sublane roll."""
    a = a_ref[:].astype(jnp.int32)
    nxt = edge_ref[0:1, :].astype(jnp.int32)                # first row
    rolled = jnp.roll(a, -1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 0)
    b = jnp.where(row == rb - 1, nxt, rolled)
    af = a.astype(jnp.bfloat16)
    bf = b.astype(jnp.bfloat16)
    lo = (jnp.dot(af, w_ref[0:128], preferred_element_type=jnp.float32)
          + jnp.dot(bf, w_ref[128:256], preferred_element_type=jnp.float32))
    hi = (jnp.dot(af, w_ref[256:384], preferred_element_type=jnp.float32)
          + jnp.dot(bf, w_ref[384:512], preferred_element_type=jnp.float32))
    keys = (lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 8)) & 0xFFFF
    hit = pf._bitmap_lookup(bitmap_ref, keys, rb)
    hit = jnp.where(pf._window_positions(rb) < n_starts, hit, 0)
    s = jnp.sum(hit, dtype=jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0

    out_ref[0, 0] += s


@functools.partial(jax.jit, static_argnames=("m", "sigma", "n", "rb"))
def exact_count_roll(text, bitmap, *, m, sigma, n, rb=RB):
    n_starts = max(0, n - m + 1)
    R = max(1, -(-n_starts // LANES))
    R = -(-R // rb) * rb
    flat_len = (R + rb) * LANES            # one whole extra zero block
    padded = jnp.zeros((flat_len,), jnp.uint8).at[:n].set(text[:n])
    rows = padded.reshape(R + rb, LANES)   # free reshape
    bits = _bits_per_char(sigma)
    w = pf.wid_weights(m, bits)
    kern = functools.partial(_kernel_roll, n_starts=n_starts, rb=rb)
    out = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[
            pl.BlockSpec((rb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (i * (rb // 8) + rb // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bitmap.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(rows, rows, bitmap, w)
    return out[0, 0]


def main_roll():
    ab = Alphabet.dna()
    text = datagen.generate_text(N, ab, seed=7)
    pats = datagen.generate_patterns(text, 10_000, M, ab, frac_present=0.5,
                                     seed=8)
    ft = build_fast(pats.codes, pats.sigma)
    bitmap = jnp.asarray(ft.bitmaps[0])
    tdev = jax.device_put(jnp.asarray(text))
    nn = 1 << 22
    truth = datagen.count_matches(text[:nn], pats)
    got = int(exact_count_roll(tdev[:nn], bitmap, m=M, sigma=4, n=nn))
    print("roll parity:", got, truth, "OK" if got == truth else "FAIL")
    fD = lambda: exact_count_roll(tdev, bitmap, m=M, sigma=4, n=N)
    print("roll count:", int(fD()))
    print("D roll        :", timeit(fD, lambda o: int(o)) * 1e3, "ms")


if __name__ == "__main__" and "--roll" in sys.argv:
    main_roll()
