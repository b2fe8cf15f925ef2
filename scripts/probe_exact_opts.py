"""Probe: exact-tier kernel variants (DNA m=8 p=10k, 256 MiB).

A  baseline exact_count_pallas (doubling keys, every-block masking)
B  window-id keys on the MXU (one banded matmul pair; wid is a polynomial
   with weights 2^(bits*(m-1-i)) — same trick as the fp weights)
C  validity masking only in the last grid block (lax.cond on program_id)
D  B + C
Each also at rb in {256, 512, 1024}.
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


@functools.lru_cache(maxsize=None)
def wid_weights(m, bits):
    W = np.zeros((256, 128), np.int64)
    for l in range(LANES):
        for i in range(m):
            W[l + i, l] = 1 << (bits * (m - 1 - i))
    lo = (W & 0xFF).astype(np.float32)
    hi = (W >> 8).astype(np.float32)
    return np.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)


def _kernel(tile_ref, bitmap_ref, *rest, m, bits, n_starts, rb, mxu, lastmask):
    if mxu:
        w_ref = rest[0]
        out_ref = rest[1]
        t_bf = tile_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
        lo = jnp.dot(t_bf, w_ref[:256], preferred_element_type=jnp.float32)
        hi = jnp.dot(t_bf, w_ref[256:], preferred_element_type=jnp.float32)
        keys = (lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 8)) & 0xFFFF
    else:
        out_ref = rest[0]
        t32 = tile_ref[:, :LANES + m - 1].astype(jnp.int32)
        keys = pf._wid_keys_2d(t32, m, bits)
    hit = pf._bitmap_lookup(bitmap_ref, keys, rb)
    if lastmask:
        full = jnp.sum(hit, dtype=jnp.int32)
        s = jax.lax.cond(
            pl.program_id(0) == pl.num_programs(0) - 1,
            lambda: jnp.sum(jnp.where(pf._window_positions(rb) < n_starts,
                                      hit, 0), dtype=jnp.int32),
            lambda: full)
    else:
        hit = jnp.where(pf._window_positions(rb) < n_starts, hit, 0)
        s = jnp.sum(hit, dtype=jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0

    out_ref[0, 0] += s


@functools.partial(jax.jit, static_argnames=("m", "sigma", "n", "rb", "mxu",
                                             "lastmask"))
def count_variant(text, bitmap, *, m, sigma, n, rb, mxu, lastmask):
    tile, n_starts = pf.overlap_rows(text, n, m, rb)
    R = tile.shape[0]
    bits = _bits_per_char(sigma)
    kern = functools.partial(_kernel, m=m, bits=bits, n_starts=n_starts,
                             rb=rb, mxu=mxu, lastmask=lastmask)
    extra = [wid_weights(m, bits)] if mxu else []
    out = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(bitmap.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in extra],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(tile, bitmap, *extra)
    return out[0, 0]


def steady(fn, reps=3, q=9):
    int(fn())
    best = None
    for _ in range(reps):
        t0 = time.time()
        rs = [fn() for _ in range(q)]
        int(rs[-1])
        t_many = time.time() - t0
        t0 = time.time()
        int(fn())
        t_one = time.time() - t0
        d = (t_many - t_one) / (q - 1)
        best = d if best is None else min(best, d)
    return best


def main():
    n = 1 << 28
    m, p = 8, 10_000
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5, seed=8)
    ft = build_fast(pats.codes, pats.sigma)
    tdev = jax.device_put(jnp.asarray(text))

    base = int(pf.exact_count_pallas(tdev, ft.bitmaps[0], m=m, sigma=4, n=n))
    dt = steady(lambda: pf.exact_count_pallas(tdev, ft.bitmaps[0], m=m,
                                              sigma=4, n=n))
    print(f"A baseline: {dt*1e3:.2f} ms = {n/dt/1e9:.2f} GB/s "
          f"count={base}", flush=True)

    for name, mxu, lastmask in (("B mxu", True, False),
                                ("C lastmask", False, True),
                                ("D both", True, True)):
        for rb in (256, 512, 1024):
            try:
                f = lambda: count_variant(tdev, ft.bitmaps[0], m=m, sigma=4,
                                          n=n, rb=rb, mxu=mxu,
                                          lastmask=lastmask)
                c = int(f())
                dt = steady(f)
                ok = "OK " if c == base else f"BAD {c}!={base}"
                print(f"{name} rb={rb}: {dt*1e3:.2f} ms = "
                      f"{n/dt/1e9:.2f} GB/s {ok}", flush=True)
            except Exception as e:
                print(f"{name} rb={rb}: FAILED {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)


def extra():
    n = 1 << 28
    m, p = 8, 10_000
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5, seed=8)
    ft = build_fast(pats.codes, pats.sigma)
    tdev = jax.device_put(jnp.asarray(text))
    base = int(pf.exact_count_pallas(tdev, ft.bitmaps[0], m=m, sigma=4, n=n))
    for rb in (2048, 4096):
        try:
            f = lambda: count_variant(tdev, ft.bitmaps[0], m=m, sigma=4,
                                      n=n, rb=rb, mxu=True, lastmask=False)
            c = int(f())
            dt = steady(f)
            ok = "OK" if c == base else f"BAD {c}"
            print(f"B mxu rb={rb}: {dt*1e3:.2f} ms = {n/dt/1e9:.2f} GB/s {ok}",
                  flush=True)
        except Exception as e:
            print(f"B mxu rb={rb}: FAILED {str(e)[:100]}", flush=True)

    # filter kernel rb sensitivity (m=32 fp tier)
    pats32 = datagen.generate_patterns(text, p, 32, ab, frac_present=0.5,
                                       seed=40)
    ft32 = build_fast(pats32.codes, pats32.sigma)
    from tpu_smatcher.ops.fast import stages_for
    k = stages_for(ft32, n, 1 << 16)
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    for rb in (128, 256, 512):
        try:
            f = lambda: red(pf.filter_mask_pallas(tdev, ft32.bitmaps[:k],
                                                  m=32, n=n, n_stages=k,
                                                  rb=rb))
            int(f())
            dt = steady(f)
            print(f"filter m=32 k={k} rb={rb}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"filter rb={rb}: FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    if "--extra" in sys.argv:
        extra()
    else:
        main()
