"""Shard-size scaling curve on the real chip (VERDICT r3 item 5).

Multi-chip scans give each device a 1/k shard plus an (m-1)-byte ppermute
halo (parallel/dist.py); the per-device compute is exactly a fast-path scan
of shard_bytes + m - 1.  Scaling efficiency is therefore bounded by how
per-shard DEVICE throughput decays as shards shrink (fixed kernel-launch /
grid overhead amortizes over fewer bytes) — the strongest single-chip
evidence for the >= 90% multi-host scaling target (BASELINE.md), standing
in for the MPI reduction whose linearity is the reference paper's headline
(main.c:463-489,656).

Method: ONE host dispatch scans a stack of identical-size shards via
jax.lax.map over the traceable per-shard count (FastScanner._device_count
— the same trace a shard_map lane runs), so the measurement isolates
device-side per-shard cost from the axon tunnel's ~20 ms per-dispatch host
overhead (a real pod issues one dispatch for ALL shards; a naive
one-dispatch-per-shard loop here measures only that host floor — see
results/shardscale_r04.log for that curve: flat ~21-27 ms/scan at every
size).  The stack holds total_bytes fixed (default 1 GiB) so device time
stays well above the fetch RTT at every shard size; per-size rate is the
best of `reps` queued timings.

Usage: python scripts/probe_shardscale.py [out=results/shardscale.jsonl]
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
from tpu_smatcher.engines import make_fast


TOTAL = 1 << 30          # bytes scanned per timing (fixed across shard sizes)
REPS = 3


def batched_rate(eng, batch_dev):
    """Device rate of scanning every row of (k, shard_len) in ONE dispatch:
    jitted lax.map over the scanner's traceable per-shard count."""
    k, n = batch_dev.shape

    @jax.jit
    def scan_all(b):
        counts = jax.lax.map(lambda t: eng._device_count(t)[0], b)
        return counts.sum()

    total = int(scan_all(batch_dev))          # compile + warm + correctness
    best = None
    for _ in range(REPS):
        t0 = time.time()
        int(scan_all(batch_dev))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return k * n / best / 1e9, total


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "results/shardscale.jsonl"
    ab = Alphabet.dna()
    text = datagen.generate_text(TOTAL, ab, seed=21)
    rows = []
    for m, p, tier in ((8, 1000, "exact"), (32, 10000, "fp")):
        pats = datagen.generate_patterns(text[: 1 << 28], p, m, ab,
                                         frac_present=0.5, seed=22 + m)
        eng = make_fast(pats)
        # parity gate on a prefix before any timing
        nn = 1 << 22
        truth = datagen.count_matches(text[:nn], pats)
        got = eng.count(jnp.asarray(text[:nn]))
        assert got == truth, (tier, got, truth)
        base_rate = None
        for mib in (256, 64, 16, 4, 1):
            n = mib << 20
            k = TOTAL // n
            batch = jax.device_put(jnp.asarray(text).reshape(k, n))
            rate, total = batched_rate(eng, batch)
            del batch
            if base_rate is None:
                base_rate = rate
            eff = rate / base_rate
            row = {"tier": tier, "m": m, "p": p, "shard_mib": mib,
                   "gbps": round(rate, 3), "eff_vs_256mib": round(eff, 4),
                   "shards_per_dispatch": k, "count": int(total)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    for tier in ("exact", "fp"):
        tier_rows = [r for r in rows if r["tier"] == tier]
        ok = [r["shard_mib"] for r in tier_rows if r["eff_vs_256mib"] >= 0.9]
        print(f"{tier}: >=90% efficiency down to {min(ok) if ok else '>256'}"
              f" MiB shards", flush=True)


if __name__ == "__main__":
    main()
