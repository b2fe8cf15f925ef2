"""Probe: where the fp-tier time goes (DNA m=32 p=10k, 256 MiB).

Times each pipeline component steady-state (queue 9, fetch once):
filter mask kernel / words view / compact / verify, plus stage-count and
rb sensitivity of the filter kernel.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.engines import make_fast
from tpu_smatcher.ops import pallas_filter as pf
from tpu_smatcher.ops.fast import (
    compact_mask, stages_for, verify_at, words_len)


def steady(fn, fetch, reps=3, q=9):
    fn()  # warm
    best = None
    for _ in range(reps):
        t0 = time.time()
        rs = [fn() for _ in range(q)]
        fetch(rs[-1])
        t_many = time.time() - t0
        t0 = time.time()
        fetch(fn())
        t_one = time.time() - t0
        d = (t_many - t_one) / (q - 1)
        best = d if best is None else min(best, d)
    return best


def main():
    n = 1 << 28
    p = 10_000
    m = 32
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5, seed=40)
    eng = make_fast(pats)
    ft = eng.ft
    tdev = jax.device_put(jnp.asarray(text))
    k = stages_for(ft, n, eng.cap)
    B = ft.stage_bits // 4096
    print(f"k={k} B={B} density={ft.density:.3f}", flush=True)

    # fetch only a scalar: hauling the full mask through the axon tunnel
    # costs minutes and measures the link, not the device
    first = lambda x: np.asarray(x if not isinstance(x, tuple) else x[0])
    red = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    small = lambda x: int(red(x if not isinstance(x, tuple) else x[0]))

    # filter kernel at the production stage count
    f_full = lambda: pf.filter_mask_pallas(tdev, ft.bitmaps[:k], m=m, n=n,
                                           n_stages=k)
    dt = steady(f_full, small)
    print(f"filter k={k}: {dt*1e3:.1f} ms", flush=True)

    # stage scaling: k=1 and k=4 isolate per-stage cost
    for kk in (1, 4):
        f = lambda: pf.filter_mask_pallas(tdev, ft.bitmaps[:kk], m=m, n=n,
                                          n_stages=kk)
        dt = steady(f, small)
        print(f"filter k={kk}: {dt*1e3:.1f} ms", flush=True)

    # words view
    f = lambda: pf.words_view_pallas(tdev, nw=words_len(n, ft.words))
    dt = steady(f, small)
    print(f"words_view: {dt*1e3:.1f} ms", flush=True)

    mask2d = jax.block_until_ready(
        pf.filter_mask_pallas(tdev, ft.bitmaps[:k], m=m, n=n, n_stages=k))
    tw = pf.words_view_pallas(tdev, nw=words_len(n, ft.words))

    # compact at half cap (the optimistic first trial)
    cap = eng.cap // 2
    f = lambda: compact_mask(mask2d, caprows=cap, cap=cap, row_slots=8)
    dt = steady(f, small)
    print(f"compact cap={cap}: {dt*1e3:.1f} ms", flush=True)

    idxs, o, _ = compact_mask(mask2d, caprows=cap, cap=cap, row_slots=8)
    print(f"  overflow={int(np.asarray(o))}", flush=True)

    f = lambda: verify_at(tw, idxs, ft.bucket_ids, ft.packed, ft.bucket_fp2,
                          m=ft.m, words=ft.words, lmax=ft.lmax, eb=ft.eb,
                          n_starts=n - ft.m + 1, slot_ok=ft.slot_ok)
    dt = steady(f, first)
    print(f"verify cap={cap}: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
