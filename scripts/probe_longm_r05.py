"""m > 1025 on the extended Pallas fast path (E-row edge references) —
VERDICT r4 item 7: the envelope must not cliff at the old cap.
Measures m in {1024, 2048, 4096} on 2^27 DNA with the r5 fori timing.
Usage: python scripts/probe_longm_r05.py"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import statistics
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
    n = 1 << 27
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    tdev = jax.device_put(jnp.asarray(text))
    for m in (1024, 2048, 4096):
        pats = datagen.generate_patterns(text, 100, m, ab,
                                         frac_present=0.5, seed=m)
        eng = make_fast(pats)
        nn = 1 << 21
        truth = datagen.count_matches(text[:nn], pats)
        t0 = time.time()
        got = eng.count(tdev[:nn])
        print(f"m={m}: parity {got}=={truth} ok={got == truth} "
              f"(compile {time.time()-t0:.0f}s)", flush=True)
        assert got == truth
        t0 = time.time()
        eng.count_async(tdev).result()
        print(f"m={m}: full-shape compile+run {time.time()-t0:.0f}s",
              flush=True)
        dts = []
        q = 9
        eng.count_repeat_async(tdev, 1).result()
        eng.count_repeat_async(tdev, q).result()
        for _ in range(3):
            t0 = time.time()
            eng.count_repeat_async(tdev, q).result()
            tq = time.time() - t0
            t0 = time.time()
            eng.count_repeat_async(tdev, 1).result()
            t1 = time.time() - t0
            dts.append((tq - t1) / (q - 1))
        dt = statistics.median(dts)
        print(f"m={m}: per-scan {dt*1e3:.1f}ms rate={n/dt/1e9:.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
