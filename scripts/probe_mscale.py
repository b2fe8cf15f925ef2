"""Probe: pattern-length scaling of the fast path (DNA p=10k, 256 MiB),
pipelined; covers the m <= 1025 Pallas range."""
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
    for m in (8, 16, 32, 64, 128, 256, 512, 1024):
        pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5,
                                         seed=100 + m)
        nn = 1 << 22
        truth = datagen.count_matches(text[:nn], pats)
        eng = make_fast(pats)
        got = eng.count(tdev[:nn])
        assert got == truth, (m, got, truth)
        eng.count_async(tdev).result()
        best = None
        for _ in range(3):
            t0 = time.time()
            fs = [eng.count_async(tdev) for _ in range(9)]
            c = fs[-1].result()
            t_many = time.time() - t0
            t0 = time.time()
            c = eng.count_async(tdev).result()
            t_one = time.time() - t0
            d = (t_many - t_one) / 8
            best = d if best is None else min(best, d)
        print(f"m={m}: count={c} {best*1e3:.1f} ms = {n/best/1e9:.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
