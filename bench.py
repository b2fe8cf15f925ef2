"""Headline benchmark: scan throughput on a synthetic EST-like DNA corpus
(sigma=4), 10k patterns — the reference's flagship configuration
(BASELINE.json: ">= 2 GB/s/chip AC scan with exact match parity", EST
corpus, m=8-32, 10k patterns; sweep space /root/reference/execute.sh:8-16).

Five tiers cover the full BASELINE m and p ranges:
  - m=8  p=10k:  the exact window-id tier (sigma^m <= 2^16)
  - m=16 p=10k:  the fingerprint tier that calibrated BLOCK_SLOTS
  - m=32 p=10k:  fingerprint filter + word-verify tier
  - m=32 p=30k / p=100k: saturating pattern sets (two-phase cascade;
    the reference CLI caps p at 100,000 — main.c:372-373)

Prints ONE JSON line: primary fields are the exact-tier scan ({"metric",
"value", "unit", "vs_baseline"}), fp tiers as fp_* fields, plus
measurement-validity fields (see below).  vs_baseline = value / 2e9 (the
driver-set 2 GB/s/chip target).  Diagnostics on stderr.

Methodology (round 5 — jitter-proof): each tier's rate comes from ONE
device dispatch running q back-to-back scans inside a lax.fori_loop
(FastScanner.count_repeat_async), so no host work happens between scans:
per-scan = (median t(q) - median t(1)) / (q - 1).  The previous
methodology (a queued count_async train, one host dispatch per scan) let
host-side jitter corrupt the subtraction — BENCH_r04 recorded 21.2 GB/s
on the exact tier, violating the repo's own ~16.4 ms structural
gather-floor argument (docs/DESIGN.md); the honest steady state is
~14.4 GB/s.  Validity self-checks recorded in the JSON:
  - "spread": max relative disagreement of the timing reps per tier
    (flagged invalid when > 10%),
  - "floor_ok": exact-tier per-scan time is not below the structural
    floor 16.4 ms x n/2^28 (a sub-floor reading means a corrupted
    measurement, not a faster kernel),
  - "valid": all tiers pass both checks.
"""
import json
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import statistics
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


#: structural exact-tier floor at n=2^28 (docs/DESIGN.md cycle accounting:
#: 16 bitmap bank gathers x ~3.7 cycles per 1024-position vreg at 940 MHz)
FLOOR_MS_2POW28 = 16.4


def steady_rate(eng, tdev, n, reps):
    """(rate, per-scan seconds, count, spread): single-dispatch fori-loop
    timing.  q is sized so the measured window (q-1 scans) spans >= ~0.5 s
    of device time; each rep measures a PAIRED (t(q), t(1)) difference, so
    the axon tunnel's ~±10 ms RTT jitter enters each per-scan sample only
    divided by (q-1).  spread = (max - min) / median over the per-rep
    per-scan times — the recorded validity signal."""
    eng.count_repeat_async(tdev, 1).result()          # warm + compile q=1
    t1a = time.time()
    eng.count_repeat_async(tdev, 1).result()
    d_est = max(time.time() - t1a - 0.030, 0.002)     # minus nominal RTT
    q = max(3, min(33, 1 + int(0.55 / d_est)))
    c = eng.count_repeat_async(tdev, q).result()      # warm + compile q
    dts = []
    for _ in range(reps):
        t0 = time.time()
        eng.count_repeat_async(tdev, q).result()
        tq = time.time() - t0
        t0 = time.time()
        eng.count_repeat_async(tdev, 1).result()
        t1 = time.time() - t0
        dts.append((tq - t1) / (q - 1))
    dt = statistics.median(dts)
    spread = (max(dts) - min(dts)) / dt
    return n / dt, dt, c // q, spread


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
    worst_spread = 0.0
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
        eng.count_async(tdev).result()             # warm/adapt full shape
        rate, dt, c, spread = steady_rate(
            eng, tdev, n, reps if pp <= 10_000 else max(3, reps // 2))
        worst_spread = max(worst_spread, spread)
        log(f"m={mm} p={pp} ({tier}): count={c} per-scan={dt*1e3:.1f}ms "
            f"rate={rate/1e9:.2f} GB/s spread={spread*100:.1f}%")
        results[tier] = (rate, dt, c)

    rate = results["exact"][0]
    floor_s = FLOOR_MS_2POW28 * 1e-3 * n / (1 << 28)
    floor_ok = results["exact"][1] >= 0.95 * floor_s
    if not floor_ok:
        log(f"VALIDITY: exact per-scan {results['exact'][1]*1e3:.1f} ms is "
            f"below the structural floor {floor_s*1e3:.1f} ms — measurement "
            "corrupted, do not trust this rate")
    print(json.dumps({
        "metric": "ac_scan_throughput",
        "value": round(rate, 1),
        "unit": "bytes/s",
        "vs_baseline": round(rate / 2e9, 3),
        "fp_m16_value": round(results["fp16"][0], 1),
        "fp_m16_vs_baseline": round(results["fp16"][0] / 2e9, 3),
        "fp_m32_value": round(results["fp"][0], 1),
        "fp_m32_vs_baseline": round(results["fp"][0] / 2e9, 3),
        "fp_m32_p30k_value": round(results["fp32_p30k"][0], 1),
        "fp_m32_p100k_value": round(results["fp32_p100k"][0], 1),
        "methodology": "fori-single-dispatch",
        "spread": round(worst_spread, 4),
        "floor_ok": floor_ok,
        "valid": bool(floor_ok and worst_spread <= 0.10),
    }))


if __name__ == "__main__":
    main()
