"""Long-pattern throughput: the m > MAX_FAST_M fallback (VERDICT r3 item 6).

The reference kernels accept any m (cuda/cuda_wm.cu:67-70); the Pallas fast
path covers m <= MAX_FAST_M and silently drops to the tiled XLA scan
beyond (ops/fast.py count_with_overflow).  The "no cliff" claim must carry a
measured rate past the boundary: this probe records sync + pipelined rates
at m around and past MAX_FAST_M (default 256, 513, 1024, 1025, 1152) on DNA
p=1000.

Usage: python scripts/probe_longm.py [n_log2=26] [ms=256,513,514,1024]
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.engines import make_fast


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 26)
    ms = ([int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2
          else [256, 513, 1024, 1025, 1152])
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=31)
    tdev = jax.device_put(jnp.asarray(text))
    nn = 1 << 21
    for m in ms:
        pats = datagen.generate_patterns(text, 1000, m, ab,
                                         frac_present=0.5, seed=32 + m)
        eng = make_fast(pats)
        truth = datagen.count_matches(text[:nn], pats)
        got = eng.count(tdev[:nn])
        assert got == truth, (m, got, truth)
        eng.count(tdev)                       # warm the full shape
        t0 = time.time()
        eng.count(tdev)
        sync = time.time() - t0
        q = 9
        t0 = time.time()
        futs = [eng.count_async(tdev) for _ in range(q)]
        for f in futs:
            f.result()
        piped = (time.time() - t0 - sync) / (q - 1)
        from tpu_smatcher.ops.pallas_filter import max_fast_m
        print(f"m={m}: backend={'pallas' if m <= max_fast_m() else 'xla-fallback'} "
              f"sync {sync*1e3:.1f} ms = {n/sync/1e9:.2f} GB/s | "
              f"pipelined {piped*1e3:.1f} ms = {n/piped/1e9:.2f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
