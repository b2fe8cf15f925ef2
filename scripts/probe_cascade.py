"""Design probe for the two-phase compaction cascade (VERDICT r4 item 1).

DESIGN.md:180-196 sizes a two-phase filter for saturating pattern sets
(p >= 30k): phase 1 = few wide stages over every position, per-128-lane-row
compaction of survivors (with their base fingerprints) into S slots, lane
repack, phase 2 = remaining stages on the packed fraction.  The open
question is the SAFE phase-1 depth: the per-row survivor distribution on
real corpora (clustering + derived-stage correlation) decides how many
stages must run dense before an S/128 slot budget holds.

This probe measures, on the real chip and the bench corpus family
(256 MiB DNA, m=32, p in {30k, 100k}):
  - per-row (128-position) survivor histograms after k1 = 2..8 stages,
  - the same at 64-lane granularity (a half-row compaction option),
  - implied overflow-row counts per scan for slot budgets 8/16/32,
  - the measured correlation factor (actual mean / independence product).

Usage: python scripts/probe_cascade.py [n_log2=27]
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.ops import pallas_filter as pf
from tpu_smatcher.ops.fast import build_fast


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 27)
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=7)
    tdev = jax.device_put(jnp.asarray(text))
    m = 32

    @jax.jit
    def row_stats(mask2d):
        rc = jnp.sum(mask2d.astype(jnp.int32), axis=1)           # per 128
        h128 = jnp.zeros((130,), jnp.int32).at[jnp.minimum(rc, 129)].add(1)
        rc64 = jnp.sum(mask2d.astype(jnp.int32).reshape(-1, 2, 64), axis=2)
        h64 = jnp.zeros((66,), jnp.int32).at[
            jnp.minimum(rc64.reshape(-1), 65)].add(1)
        return h128, h64, jnp.sum(rc)

    for p in (30_000, 100_000):
        pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5,
                                         seed=8 + m)
        ft = build_fast(pats.codes, pats.sigma)
        print(f"\n== p={p}: stage_bits={ft.stage_bits} "
              f"fills={[round(f, 3) for f in ft.stage_fills[:8]]} "
              f"n_built={len(ft.bitmaps)}", flush=True)
        for k1 in (2, 3, 4, 5, 6, 8):
            t0 = time.time()
            mask = pf.filter_mask_pallas(tdev, ft.bitmaps[:k1], m=m, n=n,
                                         n_stages=k1, cd=ft.cd(k1))
            h128, h64, tot = row_stats(mask)
            h128 = np.asarray(h128)
            h64 = np.asarray(h64)
            tot = int(tot)
            dt = time.time() - t0
            rows = h128.sum()
            mean = tot / rows / 1.0
            indep = np.prod([ft.stage_fills[s] for s in range(k1)]) * 128
            ovf = {S: int(h128[S + 1:].sum()) for S in (8, 16, 32)}
            ovf64 = {S: int(h64[S + 1:].sum()) for S in (8, 16)}
            tail = np.nonzero(h128)[0].max()
            print(json.dumps({
                "p": p, "k1": k1, "mean_per_row": round(mean, 3),
                "indep_mean": round(float(indep), 3),
                "corr_factor": round(mean / max(float(indep), 1e-9), 2),
                "max_per_row": int(tail),
                "rows_over": ovf, "halves_over_64": ovf64,
                "survival": round(tot / (n - m + 1), 5),
                "secs": round(dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
