"""Probe: slot-extraction micro-variants + FILTER_RB retune on the flat
layout (DNA m=32 p=10k, 256 MiB).

A  shipped emit_slots (per slot: eq & and & where & sum over the block)
B  pre-masked values: g1 = where(cand, gpos+1, 0) once; per slot
   eq + where(g1) + sum (non-candidates contribute 0 whatever their rank)
...each at rb in {128, 256}.
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
from tpu_smatcher.ops import pallas_filter as pf
from tpu_smatcher.ops.fast import (build_fast, stages_for, stages_for_block,
                                   words_len, compact_slots, verify_chunked)

LANES = 128
N = 1 << 28
M = 32


def emit_slots_b(cand, out_ref, tril_ref, triu_ref, *, rb, slots):
    total = jnp.sum(cand, dtype=jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    gpos = pf._window_positions(rb)
    cf = cand.astype(jnp.bfloat16)
    rows_before = jnp.sum(
        jnp.dot(tril_ref[:], cf, preferred_element_type=jnp.float32),
        axis=1, keepdims=True)
    lane_ex = jnp.dot(cf, triu_ref[:], preferred_element_type=jnp.float32)
    rank = (rows_before + lane_ex).astype(jnp.int32)
    g1 = jnp.where(cand > 0, gpos + 1, 0)
    out = jnp.full((1, LANES), -1, jnp.int32)
    for k in range(slots):
        pk = jnp.sum(jnp.where(rank == k, g1, 0), dtype=jnp.int32) - 1
        out = jnp.where(lane == k, pk, out)
    out_ref[:] = jnp.where(lane == slots, total, out)


def kern_var(a_ref, edge_ref, *refs, m, n_stages, n_starts, rb, nv, slots,
             emit):
    bitmap_refs = refs[:n_stages]
    nw = pf.n_base_fps(n_stages)
    w_refs = refs[n_stages:n_stages + nw * nv]
    tril_ref, triu_ref = refs[n_stages + nw * nv:n_stages + nw * nv + 2]
    out_ref = refs[n_stages + nw * nv + 2]
    words_ref = refs[n_stages + nw * nv + 3]
    cand = pf._candidates_flat(a_ref, edge_ref, bitmap_refs, w_refs, m=m,
                               n_stages=n_stages, n_starts=n_starts, rb=rb)
    emit(cand, out_ref, tril_ref, triu_ref, rb=rb, slots=slots)
    pf.emit_words_flat(a_ref, words_ref, rb=rb)


@functools.partial(jax.jit, static_argnames=("m", "n", "n_stages", "slots",
                                             "nw_min", "rb", "variant"))
def slots_var(text, bitmaps, *, m, n, n_stages, slots=pf.BLOCK_SLOTS,
              nw_min=0, rb=pf.FILTER_RB, variant="a"):
    n_starts = max(0, n - m + 1)
    h = pf.cdiv(max(m - 1, 1), LANES)
    nv = 1 + h
    nb8 = rb // 8
    R0 = max(1, pf.cdiv(n_starts, LANES))
    R0 = pf.cdiv(R0, rb) * rb
    assert n == R0 * LANES and int(text.shape[0]) == n
    R = R0
    rows = text.reshape(R, LANES)
    last = R // 8 - 1
    edge_map = lambda i: (jnp.minimum(i * nb8 + nb8, last), 0)
    weights = tuple(w for i in range(pf.n_base_fps(n_stages))
                    for w in pf.fp_weights_views(pf.FP_MULTS[i], m))
    tril, triu = pf._rank_weights(rb)
    emit = pf.emit_slots if variant == "a" else emit_slots_b
    kern = functools.partial(kern_var, m=m, n_stages=n_stages,
                             n_starts=n_starts, rb=rb, nv=nv, slots=slots,
                             emit=emit)
    slotmat, words = pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, LANES), edge_map, memory_space=pltpu.VMEM)]
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
    )(rows, rows, *bitmaps, *weights, tril, triu)
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
    pats = datagen.generate_patterns(text, 10_000, M, ab, frac_present=0.5,
                                     seed=8 + M)
    ft = build_fast(pats.codes, pats.sigma)
    k = min(max(stages_for(ft, N, 1 << 16),
                stages_for_block(ft, pf.FILTER_RB * 128)),
            len(ft.bitmaps))
    bms = ft.bitmaps[:k]
    nw = words_len(N, ft.words)

    def make(rb, v):
        def run(t):
            sm, tw = slots_var(t, bms, m=M, n=N, n_stages=k, nw_min=nw,
                               rb=rb, variant=v)
            idxs, o, n_cand = compact_slots(sm, slots=pf.BLOCK_SLOTS,
                                            cap=1 << 16)
            return verify_chunked(tw, idxs, n_cand, ft, n_starts=N - M + 1)
        return jax.jit(run)

    ref = None
    for rb in (128, 256):
        for variant in ("a", "b"):
            f_j = make(rb, variant)
            c = int(f_j(tdev))
            if ref is None:
                ref = c
            ok = "OK" if c == ref else "FAIL"
            t = timeit(lambda: f_j(tdev), lambda o: int(o))
            print(f"rb={rb} variant={variant}: {t*1e3:.1f}ms "
                  f"({N/t/1e9:.2f} GB/s) count={c} {ok}", flush=True)


if __name__ == "__main__":
    main()
