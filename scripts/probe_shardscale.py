"""Shard-size scaling curve on the real chip (VERDICT r3 item 5).

Multi-chip scans give each device a 1/k shard plus an (m-1)-byte ppermute
halo (parallel/dist.py); the per-device compute is exactly a fast-path scan
of shard_bytes + m - 1.  Scaling efficiency is therefore bounded by how
per-shard throughput decays as shards shrink (fixed dispatch/grid overhead
amortizes over fewer bytes) — the strongest single-chip evidence for the
>= 90% multi-host scaling target (BASELINE.md), standing in for the MPI
reduction whose linearity is the reference paper's headline
(main.c:463-489,656).

Method: steady-state queued device time (QUEUE scans dispatched, one fetch;
subtract the 1-scan baseline to cancel the host RTT) per shard size
256 -> 1 MiB, both tiers.  Prints JSONL rows + the efficiency vs the
256 MiB rate.

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


def steady_rate(eng, tdev, n, *, target_ms=400.0):
    """Queued-scan device rate: q scans + 1 fetch, minus the 1-scan
    baseline, q sized so the queued device time is resolvable."""
    f = eng.count_async(tdev)
    c0 = f.result()                      # compile + warm
    t0 = time.time()
    eng.count_async(tdev).result()
    base = time.time() - t0
    q = max(8, int(target_ms / 1e3 / max(n / 3e9, 1e-5)))
    q = min(q, 4096)
    t0 = time.time()
    futs = [eng.count_async(tdev) for _ in range(q)]
    for fu in futs:
        fu.result()
    dt = time.time() - t0 - base
    return n * q / dt / 1e9, q, c0


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "results/shardscale.jsonl"
    ab = Alphabet.dna()
    n_full = 1 << 28
    text = datagen.generate_text(n_full, ab, seed=21)
    rows = []
    for m, p, tier in ((8, 1000, "exact"), (32, 10000, "fp")):
        pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5,
                                         seed=22 + m)
        eng = make_fast(pats)
        base_rate = None
        for mib in (256, 64, 16, 4, 1):
            n = mib << 20
            tdev = jax.device_put(jnp.asarray(
                np.frombuffer(text.tobytes()[:n], np.uint8)))
            rate, q, c = steady_rate(eng, tdev, n)
            if base_rate is None:
                base_rate = rate
            eff = rate / base_rate
            row = {"tier": tier, "m": m, "p": p, "shard_mib": mib,
                   "gbps": round(rate, 3), "eff_vs_256mib": round(eff, 4),
                   "queue": q, "count": int(c)}
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
