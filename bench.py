"""Headline benchmark: AC-engine scan throughput on a synthetic EST-like DNA
corpus (sigma=4), m=8, 10k patterns — the reference's flagship configuration
(BASELINE.json: ">= 2 GB/s/chip AC scan with exact match parity").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 2e9 (the driver-set 2 GB/s/chip target).
Diagnostics go to stderr.
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from tpu_smatcher.core.alphabet import Alphabet
    from tpu_smatcher.core import datagen
    from tpu_smatcher.engines import make_fast

    n = int(os.environ.get("BENCH_N", 1 << 28))        # 256 MiB
    m = int(os.environ.get("BENCH_M", 8))
    p = int(os.environ.get("BENCH_P", 10_000))
    reps = int(os.environ.get("BENCH_REPS", 5))

    ab = Alphabet.dna()
    log(f"bench: n={n} ({n/2**20:.0f} MiB) m={m} p={p} devices={jax.devices()}")
    text = datagen.generate_text(n, ab, seed=7)
    pats = datagen.generate_patterns(text, p, m, ab, frac_present=0.5, seed=8)

    # correctness gate on a 4 MiB prefix vs host ground truth
    nn = 1 << 22
    truth = datagen.count_matches(text[:nn], pats)

    eng = make_fast(pats)
    tdev = jax.device_put(jnp.asarray(text))

    got = eng.count(tdev[:nn])
    if got != truth:
        log(f"CORRECTNESS FAILURE: {got} != {truth}")
        print(json.dumps({"metric": "ac_scan_throughput", "value": 0.0,
                          "unit": "bytes/s", "vs_baseline": 0.0}))
        return

    # Steady-state throughput: queue `reps` scans and fetch one result.
    # A per-scan host sync would measure host<->device round-trip latency
    # (~30ms over a tunnel) instead of device throughput; production
    # pipelines stream scans back-to-back, which is what this measures.
    # per-scan = (time of (1 dispatch + k scans + 1 fetch)
    #             - time of (1 dispatch + 1 scan + 1 fetch)) / (k - 1).
    if eng.ft.exact:
        from tpu_smatcher.ops import pallas_filter as pf
        scan = lambda: pf.exact_count_pallas(tdev, eng.ft.bitmaps[0], m=m,
                                             sigma=pats.sigma, n=n)
        c = int(scan())                  # warm
        best = None
        for _ in range(reps):
            t0 = time.time()
            rs = [scan() for _ in range(9)]
            c = int(rs[-1])
            t_many = time.time() - t0
            t0 = time.time()
            c = int(scan())
            t_one = time.time() - t0
            dt = (t_many - t_one) / 8
            best = dt if best is None else min(best, dt)
        dt = best
    else:                                # fingerprint tier: sync per scan
        c = eng.count(tdev)
        times = []
        for _ in range(reps):
            t0 = time.time()
            c = eng.count(tdev)
            times.append(time.time() - t0)
        dt = min(times)
    rate = n / dt
    log(f"count={c} per-scan={dt*1e3:.1f}ms rate={rate/1e9:.2f} GB/s")
    print(json.dumps({
        "metric": "ac_scan_throughput",
        "value": round(rate, 1),
        "unit": "bytes/s",
        "vs_baseline": round(rate / 2e9, 3),
    }))


if __name__ == "__main__":
    main()
