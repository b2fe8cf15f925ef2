"""Headline benchmark: scan throughput on a synthetic EST-like DNA corpus
(sigma=4), 10k patterns — the reference's flagship configuration
(BASELINE.json: ">= 2 GB/s/chip AC scan with exact match parity", EST
corpus, m=8-32, 10k patterns; sweep space /root/reference/execute.sh:8-16).

Three tiers are measured, covering the full BASELINE m range:
  - m=8:  the exact window-id tier (sigma^m <= 2^16)
  - m=16: the fingerprint tier at the corpus that calibrated BLOCK_SLOTS
          (pallas_filter.py) — a regression here would otherwise be
          invisible to the driver
  - m=32: the fingerprint-filter + word-verify tier

Prints ONE JSON line whose primary fields are the exact-tier scan
({"metric", "value", "unit", "vs_baseline"}), with the fingerprint tiers as
additional fields (fp_m16_value / fp_m16_vs_baseline, fp_m32_value /
fp_m32_vs_baseline) so regressions on any tier are visible in the recorded
BENCH_r*.json.  vs_baseline is
value / 2e9 (the driver-set 2 GB/s/chip target).  Diagnostics on stderr.

Methodology: queue `QUEUE` scans via count_async and fetch one result —
a per-scan host sync would measure the host<->device round-trip (~30 ms
over the axon tunnel), not device throughput; production pipelines stream
scans back-to-back (ScanFuture), which is what this measures.
per-scan = (time of (dispatch + k scans + fetch) -
            time of (dispatch + 1 scan + fetch)) / (k - 1).
"""
import json
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


QUEUE = 9


def steady_rate(eng, tdev, n, reps):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fs = [eng.count_async(tdev) for _ in range(QUEUE)]
        c = fs[-1].result()
        t_many = time.time() - t0
        t0 = time.time()
        c = eng.count_async(tdev).result()
        t_one = time.time() - t0
        dt = (t_many - t_one) / (QUEUE - 1)
        best = dt if best is None else min(best, dt)
    return n / best, best, c


def _require_device(timeout_s: int):
    """Fail fast (exit 1) if the accelerator is unreachable.

    Over the axon tunnel a backend outage makes `jax.devices()` block
    indefinitely (observed: >10 min during the 2026-08-17 outage) — a
    hang here would stall the whole benchmark driver, so device discovery
    runs on a daemon thread under a deadline."""
    import threading
    devs, errs = [], []

    def probe():
        try:
            import jax
            devs.append(jax.devices())
        except Exception as e:               # report, don't claim "timeout"
            errs.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not devs:
        why = (f"device discovery raised {errs[0]!r}" if errs
               else f"no JAX device within {timeout_s}s "
                    "(TPU backend unreachable?)")
        log(f"FATAL: {why} — aborting instead of hanging")
        os._exit(1)
    return devs[0]


def main():
    devices = _require_device(int(os.environ.get("BENCH_DEVICE_TIMEOUT",
                                                 "300")))
    import jax
    import jax.numpy as jnp
    from tpu_smatcher.core.alphabet import Alphabet
    from tpu_smatcher.core import datagen
    from tpu_smatcher.engines import make_fast

    n = int(os.environ.get("BENCH_N", 1 << 28))        # 256 MiB
    m = int(os.environ.get("BENCH_M", 8))
    m_fp16 = int(os.environ.get("BENCH_M_FP16", 16))
    m_fp = int(os.environ.get("BENCH_M_FP", 32))
    p = int(os.environ.get("BENCH_P", 10_000))
    reps = int(os.environ.get("BENCH_REPS", 5))

    ab = Alphabet.dna()
    log(f"bench: n={n} ({n/2**20:.0f} MiB) m={m}/{m_fp16}/{m_fp} p={p} "
        f"devices={devices}")
    text = datagen.generate_text(n, ab, seed=7)
    tdev = jax.device_put(jnp.asarray(text))
    nn = 1 << 22                      # correctness-gate prefix (4 MiB)

    results = {}
    # the BASELINE configs: m=8/16/32 at the flagship p=10k, plus the
    # large-pattern-set family (WM 10k-100k patterns, BASELINE.md /
    # main.c:372-373 p <= 100,000) whose WIDE filter stages (> 2^16 bits)
    # would otherwise be invisible to the driver
    tiers = (("exact", m, p), ("fp16", m_fp16, p), ("fp", m_fp, p),
             ("fp32_p30k", m_fp, 30_000), ("fp32_p100k", m_fp, 100_000))
    for tier, mm, pp in tiers:
        pats = datagen.generate_patterns(text, pp, mm, ab, frac_present=0.5,
                                         seed=8 if mm == m else 8 + mm)
        truth = datagen.count_matches(text[:nn], pats)
        eng = make_fast(pats)
        got = eng.count(tdev[:nn])
        if got != truth:
            log(f"CORRECTNESS FAILURE m={mm} p={pp}: {got} != {truth}")
            results[tier] = (0.0, 0.0, 0)
            continue
        eng.count_async(tdev).result()             # warm/compile full shape
        rate, dt, c = steady_rate(eng, tdev, n,
                                  reps if pp <= 10_000 else max(2, reps // 2))
        log(f"m={mm} p={pp} ({tier}): count={c} per-scan={dt*1e3:.1f}ms "
            f"rate={rate/1e9:.2f} GB/s")
        results[tier] = (rate, dt, c)

    rate = results["exact"][0]
    fp16_rate = results["fp16"][0]
    fp_rate = results["fp"][0]
    print(json.dumps({
        "metric": "ac_scan_throughput",
        "value": round(rate, 1),
        "unit": "bytes/s",
        "vs_baseline": round(rate / 2e9, 3),
        "fp_m16_value": round(fp16_rate, 1),
        "fp_m16_vs_baseline": round(fp16_rate / 2e9, 3),
        "fp_m32_value": round(fp_rate, 1),
        "fp_m32_vs_baseline": round(fp_rate / 2e9, 3),
        "fp_m32_p30k_value": round(results["fp32_p30k"][0], 1),
        "fp_m32_p100k_value": round(results["fp32_p100k"][0], 1),
    }))


if __name__ == "__main__":
    main()
