"""Probe: bank-combine variants for the B=4 derived-stage filter
(DNA m=32 p=10k, 256 MiB): linear cmp+select chain (current) vs binary
mux tree vs arithmetic or-of-masked."""
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
from tpu_smatcher.engines import make_fast
from tpu_smatcher.ops.fast import FP_MULTS, stages_for
from tpu_smatcher.ops import pallas_filter as pf

LANES = 128


def _lookup_tree(bitmap_ref, keys, rb):
    B = bitmap_ref.shape[0]
    lane = (keys >> 5) & 127
    vs = []
    for b in range(B):
        tab = jnp.broadcast_to(bitmap_ref[b][None, :], (rb, LANES))
        vs.append(jnp.take_along_axis(tab, lane, axis=1))
    while len(vs) > 1:                      # binary mux tree on bank bits
        level = (B // len(vs)).bit_length() - 1 + 12
        nxt = []
        bit = (keys >> level) & 1
        for i in range(0, len(vs), 2):
            nxt.append(jnp.where(bit == 1, vs[i + 1], vs[i]))
        vs = nxt
    return (vs[0] >> (keys & 31)) & 1


def _lookup_ormask(bitmap_ref, keys, rb):
    B = bitmap_ref.shape[0]
    lane = (keys >> 5) & 127
    bank = keys >> 12
    acc = jnp.zeros((rb, LANES), jnp.int32)
    for b in range(B):
        tab = jnp.broadcast_to(bitmap_ref[b][None, :], (rb, LANES))
        v = jnp.take_along_axis(tab, lane, axis=1)
        acc = acc | jnp.where(bank == b, v, 0)
    return (acc >> (keys & 31)) & 1


LOOKUPS = {"select": pf._bitmap_lookup, "tree": _lookup_tree,
           "ormask": _lookup_ormask}


def _kernel(tile_ref, *refs, n_stages, n_starts, rb, parts, mode):
    nw = pf.n_base_fps(n_stages)
    bitmap_refs = refs[:n_stages]
    w_refs = refs[n_stages:n_stages + nw * parts]
    mask_ref = refs[n_stages + nw * parts]
    t_bf = tile_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    bases = [pf._fp_keys_mxu(t_bf, w_refs[i * parts:(i + 1) * parts], 0xFFFF)
             for i in range(nw)]
    smask = bitmap_refs[0].shape[0] * 4096 - 1
    lookup = LOOKUPS[mode]
    cand = None
    for s in range(n_stages):
        hit = lookup(bitmap_refs[s], pf.derived_keys(bases, s, smask), rb)
        cand = hit if cand is None else (cand & hit)
    cand = jnp.where(pf._window_positions(rb) < n_starts, cand, 0)
    mask_ref[:] = cand.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("m", "n", "n_stages", "rb",
                                             "mode"))
def variant(text, bitmaps, *, m, n, n_stages, rb, mode):
    tile, n_starts = pf.overlap_rows(text, n, m, rb)
    R = tile.shape[0]
    weights = tuple(part for i in range(pf.n_base_fps(n_stages))
                    for part in pf.fp_weights(FP_MULTS[i], m))
    parts = pf.cdiv(m, pf.PART_TERMS)
    kern = functools.partial(_kernel, n_stages=n_stages, n_starts=n_starts,
                             rb=rb, parts=parts, mode=mode)
    return pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, pf.row_bytes_for(m)), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bitmaps]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in weights],
        out_specs=pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.int8),
    )(tile, *bitmaps, *weights)


def steady(fn, red, reps=3, q=9):
    int(red(fn()))
    best = None
    for _ in range(reps):
        t0 = time.time()
        rs = [fn() for _ in range(q)]
        int(red(rs[-1]))
        t_many = time.time() - t0
        t0 = time.time()
        int(red(fn()))
        t_one = time.time() - t0
        d = (t_many - t_one) / (q - 1)
        best = d if best is None else min(best, d)
    return best


def main():
    n = 1 << 28
    m, p = 32, 10_000
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5, seed=40)
    eng = make_fast(pats)
    ft = eng.ft
    k = stages_for(ft, n, eng.cap)
    tdev = jax.device_put(jnp.asarray(text))
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    ref_sum = None
    for mode in ("select", "tree", "ormask"):
        f = lambda: variant(tdev, ft.bitmaps[:k], m=m, n=n, n_stages=k,
                            rb=pf.FILTER_RB, mode=mode)
        s = int(red(f()))
        if ref_sum is None:
            ref_sum = s
        ok = "OK" if s == ref_sum else f"BAD {s}!={ref_sum}"
        dt = steady(f, red)
        print(f"{mode}: {dt*1e3:.2f} ms {ok}", flush=True)


if __name__ == "__main__":
    main()
