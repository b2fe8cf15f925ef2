"""Probe: fingerprint-tier throughput at LARGE pattern counts (p=10k/30k/100k).

The reference CLI accepts up to p=100,000 patterns (main.c:372-373); at that
scale the 16-bit fingerprint space saturates (stage fill ~0.78) and the
budget-piece path (ops/fast.py) has never been measured.  This probe records
the current stage configuration and measured count() throughput per
(m, p) cell, parity-gated on a 4 MiB prefix.

Usage: python scripts/probe_bigp.py [n_log2=27] [ms=16,32] [ps=10000,30000,100000]
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
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
    n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 27
    ms = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [16, 32]
    ps = ([int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3
          else [10_000, 30_000, 100_000])
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    tdev = jax.device_put(jnp.asarray(text))
    nn = 1 << 22
    for m in ms:
        for p in ps:
            t0 = time.time()
            pats = datagen.generate_patterns(text, p, m, ab,
                                             frac_present=0.5, seed=8 + m)
            t_gen = time.time() - t0
            t0 = time.time()
            eng = make_fast(pats)
            t_build = time.time() - t0
            ft = eng.ft
            from tpu_smatcher.ops.fast import stages_for, stages_for_block
            from tpu_smatcher.ops import pallas_filter as pf
            k = stages_for(ft, n, eng.cap)
            kb = stages_for_block(ft, pf.SLOT_RB * 128)
            print(f"m={m} p={p}: build={t_build:.1f}s gen={t_gen:.1f}s "
                  f"stage_bits={ft.stage_bits} built={len(ft.bitmaps)} "
                  f"fill0={ft.density:.3f} k={k} kb={kb} lmax={ft.lmax} "
                  f"eb={ft.eb} slot_ok={ft.slot_ok}", flush=True)
            # parity gate
            truth = datagen.count_matches(text[:nn], pats)
            got = eng.count(tdev[:nn])
            assert got == truth, (got, truth)
            # measured count() (sync; piece path is internally pipelined)
            c = eng.count(tdev)
            times = []
            for _ in range(3):
                t0 = time.time()
                c = eng.count(tdev)
                times.append(time.time() - t0)
            dt = min(times)
            print(f"  count={c} sync: {dt*1e3:.1f} ms = {n/dt/1e9:.2f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
