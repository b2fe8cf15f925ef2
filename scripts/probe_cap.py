"""Probe: fp-tier end-to-end rate vs candidate cap (DNA m=16/32 p=10k, 256 MiB).

compact+verify cost scales with the STATIC cap while stages_for sizes the
stage count so expected candidates <= cap/4 — a smaller cap trades a few
extra derived stages (~4 bank gathers each) for a proportionally cheaper
compact+verify.  Measures the async path (the production count()) steady
state and checks count parity across caps.
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
from tpu_smatcher.ops.fast import stages_for


def steady_async(sc, tdev, reps=3, q=9):
    sc.count(tdev)  # warm/compile
    best = None
    for _ in range(reps):
        t0 = time.time()
        futs = [sc.count_async(tdev) for _ in range(q)]
        c = futs[-1].result()
        t_many = time.time() - t0
        t0 = time.time()
        sc.count_async(tdev).result()
        t_one = time.time() - t0
        d = (t_many - t_one) / (q - 1)
        best = d if best is None else min(best, d)
    return best, c


def main():
    n = 1 << 28
    p = 10_000
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    tdev = jax.device_put(jnp.asarray(text))
    for m in (16, 32):
        pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5,
                                         seed=40)
        counts = {}
        for cap in (1 << 16, 1 << 15, 1 << 14, 1 << 13):
            sc = make_fast(pats, cap=cap)
            k = stages_for(sc.ft, n, cap)
            dt, c = steady_async(sc, tdev)
            counts[cap] = c
            print(f"m={m} cap={cap:6d} k={k:2d} B={sc.ft.stage_bits//4096} "
                  f"{dt*1e3:6.1f} ms  {n/dt/1e9:5.2f} GB/s  count={c}",
                  flush=True)
        assert len(set(counts.values())) == 1, counts


if __name__ == "__main__":
    main()
