"""Probe: fp-tier throughput at the BASELINE config (DNA, m=16/32, p=10k).

Measures (a) the public count() path (one host sync per scan) and (b) the
steady-state pipelined rate of the traceable core (queue 9, fetch once) —
the methodology bench.py uses for the exact tier.
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


def main():
    n = 1 << 28
    p = 10_000
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    tdev = jax.device_put(jnp.asarray(text))
    for m in (16, 32):
        pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5,
                                         seed=8 + m)
        eng = make_fast(pats)
        ft = eng.ft
        print(f"m={m}: exact={ft.exact} stage_bits={ft.stage_bits} "
              f"density={ft.density:.3f} lmax={ft.lmax} eb={ft.eb} "
              f"slot_ok={ft.slot_ok} words={ft.words}", flush=True)
        from tpu_smatcher.ops.fast import stages_for
        k = stages_for(ft, n, eng.cap)
        print(f"  n_stages={k} -> bank gathers/pos = "
              f"{k * ft.stage_bits // 4096}", flush=True)

        # (a) public count(), sync per call
        c = eng.count(tdev)
        times = []
        for _ in range(3):
            t0 = time.time()
            c = eng.count(tdev)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"  count={c} sync-included: {dt*1e3:.1f} ms = "
              f"{n/dt/1e9:.2f} GB/s", flush=True)

        # (b) pipelined count_async (optimistic half-cap device pass),
        # queue 9 fetch once
        cc = eng.count_async(tdev).result()      # warm/compile
        print(f"  async count={cc}", flush=True)
        best = None
        for _ in range(3):
            t0 = time.time()
            fs = [eng.count_async(tdev) for _ in range(9)]
            cc = fs[-1].result()
            t_many = time.time() - t0
            t0 = time.time()
            cc = eng.count_async(tdev).result()
            t_one = time.time() - t0
            d = (t_many - t_one) / 8
            best = d if best is None else min(best, d)
        print(f"  pipelined: {best*1e3:.1f} ms = {n/best/1e9:.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
