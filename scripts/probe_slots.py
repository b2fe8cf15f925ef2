"""Probe: fused in-kernel slot compaction vs the mask+compact async path
(DNA m=16/32 p=10k, 256 MiB).  Baselines (mask path, cap=65536): m=16
84.5 ms / m=32 87.8 ms; counts 5630 / 5000.
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
from tpu_smatcher.ops.fast import stages_for, stages_for_block
from tpu_smatcher.ops import pallas_filter as pf


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
    expect = {16: 5630, 32: 5000}
    for m in (16, 32):
        pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5,
                                         seed=40)
        sc = make_fast(pats)
        k = max(stages_for(sc.ft, n, sc.cap),
                stages_for_block(sc.ft, pf.FILTER_RB * 128))
        dt, c = steady_async(sc, tdev)
        print(f"m={m} slots k={k} {dt*1e3:6.1f} ms  {n/dt/1e9:5.2f} GB/s  "
              f"count={c} (expect {expect[m]})", flush=True)
        assert c == expect[m], (c, expect[m])


if __name__ == "__main__":
    main()
