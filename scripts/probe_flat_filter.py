"""Probe: fp-tier flat layout vs the (R, row_bytes) overlap tile, head to
head in one process (DNA p=10k, 256 MiB, m in {16, 32}).

OLD = overlap_rows concat + _filter_slots_kernel (the round-2 shipped path,
reconstructed here); NEW = the flat filter_slots_pallas now in the tree.
Both feed the same compact_slots + verify_chunked, so the delta is the
layout + kernel alone.
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
from tpu_smatcher.ops import fast as fast_mod
from tpu_smatcher.ops import pallas_filter as pf
from tpu_smatcher.ops.fast import (FP_MULTS, build_fast, stages_for,
                                   stages_for_block, words_len,
                                   compact_slots, verify_chunked)

LANES = 128
N = 1 << 28


def _candidates_old(tile_ref, bitmap_refs, w_refs, *, n_stages, n_starts,
                    rb, parts):
    """The round-2 (rb, row_bytes) tile filter body (removed from
    pallas_filter when the flat layout replaced it)."""
    nw = pf.n_base_fps(n_stages)
    t_bf = tile_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    bases = [pf._fp_keys_mxu(t_bf, w_refs[i * parts:(i + 1) * parts], 0xFFFF)
             for i in range(nw)]
    smask = bitmap_refs[0].shape[0] * 4096 - 1
    cand = None
    for s in range(n_stages):
        hit = pf._bitmap_lookup(bitmap_refs[s],
                                pf.derived_keys(bases, s, smask), rb)
        cand = hit if cand is None else (cand & hit)
    return jnp.where(pf._window_positions(rb) < n_starts, cand, 0)


def _filter_slots_kernel_old(tile_ref, *refs, m, n_stages, n_starts, rb,
                             parts, slots):
    bitmap_refs = refs[:n_stages]
    nw = pf.n_base_fps(n_stages)
    w_refs = refs[n_stages:n_stages + nw * parts]
    tril_ref, triu_ref = refs[n_stages + nw * parts:n_stages + nw * parts + 2]
    out_ref = refs[n_stages + nw * parts + 2]
    words_ref = refs[n_stages + nw * parts + 3]
    cand = _candidates_old(tile_ref, bitmap_refs, w_refs, n_stages=n_stages,
                           n_starts=n_starts, rb=rb, parts=parts)
    pf.emit_slots(cand, out_ref, tril_ref, triu_ref, rb=rb, slots=slots)
    pf.emit_words(tile_ref, words_ref, rb=rb)


@functools.partial(jax.jit, static_argnames=("m", "n", "n_stages", "slots",
                                             "nw_min", "rb"))
def filter_slots_old(text, bitmaps, *, m, n, n_stages,
                     slots=pf.BLOCK_SLOTS, nw_min=0, rb=128):
    tile, n_starts = pf.overlap_rows(text, n, m, rb,
                                     min_rows=pf.cdiv(nw_min, LANES // 4))
    R = tile.shape[0]
    weights = tuple(part for i in range(pf.n_base_fps(n_stages))
                    for part in pf.fp_weights(FP_MULTS[i], m))
    parts = pf.cdiv(m, pf.PART_TERMS)
    tril, triu = pf._rank_weights(rb)
    kern = functools.partial(_filter_slots_kernel_old, m=m, n_stages=n_stages,
                             n_starts=n_starts, rb=rb, parts=parts,
                             slots=slots)
    slotmat, words = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, pf.row_bytes_for(m)), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bitmaps]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in weights]
        + [pl.BlockSpec(tril.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec(triu.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rb // 4, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, (R // rb) * LANES), jnp.int32),
                   jax.ShapeDtypeStruct((R // 4, LANES), jnp.int32)],
    )(tile, *bitmaps, *weights, tril, triu)
    return slotmat.reshape(R // rb, LANES), words.reshape(-1)


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
        best = min(best or 9e9, (t_many - t_one) / (queue - 1))
    return best


def main():
    ab = Alphabet.dna()
    text = datagen.generate_text(N, ab, seed=7)
    tdev = jax.device_put(jnp.asarray(text))
    for m in (16, 32):
        pats = datagen.generate_patterns(text, 10_000, m, ab,
                                         frac_present=0.5, seed=8 + m)
        ft = build_fast(pats.codes, pats.sigma)
        k = min(max(stages_for(ft, N, 1 << 16),
                    stages_for_block(ft, pf.FILTER_RB * 128)),
                len(ft.bitmaps))
        bms = ft.bitmaps[:k]
        nw = words_len(N, ft.words)

        # jit the WHOLE pipeline: an eager verify_chunked dispatches every
        # lax.cond branch as its own device call over the ~30 ms tunnel,
        # drowning the kernel delta
        def make(fn):
            def run(t):
                slotmat, tw = fn(t)
                idxs, o, n_cand = compact_slots(slotmat,
                                                slots=pf.BLOCK_SLOTS,
                                                cap=1 << 16)
                return verify_chunked(tw, idxs, n_cand, ft,
                                      n_starts=N - m + 1)
            return jax.jit(run)

        f_old_j = make(lambda t: filter_slots_old(
            t, bms, m=m, n=N, n_stages=k, nw_min=nw))
        f_new_j = make(lambda t: pf.filter_slots_pallas(
            t, bms, m=m, n=N, n_stages=k, nw_min=nw))
        f_old = lambda: f_old_j(tdev)
        f_new = lambda: f_new_j(tdev)
        c_old, c_new = int(f_old()), int(f_new())
        print(f"m={m} k={k} counts old={c_old} new={c_new}",
              "OK" if c_old == c_new else "FAIL")
        t_old = timeit(f_old, lambda o: int(o))
        t_new = timeit(f_new, lambda o: int(o))
        print(f"m={m}: old={t_old*1e3:.1f}ms new={t_new*1e3:.1f}ms "
              f"({N/t_old/1e9:.2f} -> {N/t_new/1e9:.2f} GB/s)")


if __name__ == "__main__":
    main()
