"""A/B: engine stages on the flat (rows,128) layout vs the overlap tile.

The AC/SH/SBOM stages key off MXU banded matmuls and can ride the flat
layout (no materialized overlap concat, ~2n less HBM traffic); WM/SOG
stage-0 value lookups need misaligned column slices and keep the tile
(docs/DESIGN.md dead-end list).  This probe measures both arms back-to-back
in ONE process so chip-session bias cancels (VERDICT r3 weak #4: separate
runs drift ~5%).

Usage: python scripts/probe_flat_engines.py [n_log2=27] [queue=33]
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
from tpu_smatcher.engines import make_engine
from tpu_smatcher.ops import pallas_engines as pe


def piped(eng, tdev, n, q):
    eng.count_async(tdev).result()        # compile + warm
    t0 = time.time()
    eng.count_async(tdev).result()
    base = time.time() - t0
    t0 = time.time()
    futs = [eng.count_async(tdev) for _ in range(q)]
    for f in futs:
        f.result()
    dt = time.time() - t0 - base
    return n * q / dt / 1e9


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 27)
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 33
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=41)
    tdev = jax.device_put(jnp.asarray(text))
    nn = 1 << 21
    for m, p in ((8, 1000), (32, 10000)):
        pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5,
                                         seed=42 + m)
        truth = datagen.count_matches(text[:nn], pats)
        for name in ("ac", "sh", "sbom"):
            rates = {}
            for arm, ok in (("tiled", False), ("flat", True)):
                orig = pe.EngineFastPath._flat_ok
                pe.EngineFastPath._flat_ok = (lambda self: False) if not ok \
                    else orig
                try:
                    eng = make_engine(name, pats)
                    assert eng.count(tdev[:nn]) == truth, (name, arm)
                    rates[arm] = piped(eng, tdev, n, q)
                finally:
                    pe.EngineFastPath._flat_ok = orig
            d = rates["flat"] / rates["tiled"] - 1
            print(f"m={m} p={p} {name}: tiled {rates['tiled']:.2f} GB/s  "
                  f"flat {rates['flat']:.2f} GB/s  ({d:+.1%})", flush=True)


if __name__ == "__main__":
    main()
