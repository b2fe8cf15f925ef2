"""Benchmark sweep — the execute.sh analogue (reference execute.sh:9-56).

Loops engines x p_size {1000, 8000} x the reference's six corpus shapes
(random sigma=2, E.coli sigma=4, A_thaliana.fna sigma=4, swiss-prot sigma=20,
A_thaliana.faa sigma=20, world192 sigma=128 — sizes from main.c:38-118),
generated synthetically at the same (n, sigma) since the bio files are not
shipped with the reference either (its ../data-cuda-multi is out of tree).

Each run verifies cross-engine count agreement (the reference's correctness
methodology, SURVEY.md §4.1) and appends one JSON line per (engine, corpus,
p_size) to the output file.

  python scripts/sweep.py                 # quick: scaled-down corpora
  python scripts/sweep.py --full          # reference-size corpora
  python scripts/sweep.py --engines fast ac --out sweep.jsonl
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: (name, n, sigma) — main.c:38-118 / execute.sh:16-51
CORPORA = [
    ("random2", 3_999_744, 2),
    ("ecoli", 4_628_736, 4),
    ("athaliana_fna", 116_234_496, 4),
    ("swissprot", 177_649_920, 20),
    ("athaliana_faa", 10_821_888, 20),
    ("world192", 1_903_104, 128),
]

P_SIZES = [1000, 8000]           # execute.sh:9
DEFAULT_ENGINES = ["fast", "ac", "wm", "sh", "sbom", "sog8"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", nargs="+", default=DEFAULT_ENGINES)
    ap.add_argument("--p-sizes", nargs="+", type=int, default=P_SIZES)
    ap.add_argument("--m", type=int, default=8)       # execute.sh:16
    ap.add_argument("--full", action="store_true",
                    help="reference corpus sizes (default: scaled to 1/16)")
    ap.add_argument("--corpora", nargs="+", default=None,
                    help="subset of corpus names (default: all six)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="sweep.jsonl")
    args = ap.parse_args()

    import jax
    from tpu_smatcher.core.alphabet import Alphabet
    from tpu_smatcher.core import datagen
    from tpu_smatcher.engines import make_engine, make_fast
    from tpu_smatcher.utils import PhaseTimer, time_jit, emit_jsonl

    scale = 1 if args.full else 16
    backend = jax.default_backend()
    print(f"sweep: backend={backend} scale=1/{scale} -> {args.out}",
          file=sys.stderr)

    corpora = CORPORA
    if args.corpora:
        unknown = set(args.corpora) - {c[0] for c in CORPORA}
        if unknown:
            ap.error(f"unknown corpora: {sorted(unknown)}")
        corpora = [c for c in CORPORA if c[0] in args.corpora]

    for name, n_full, sigma in corpora:
        n = n_full // scale
        ab = Alphabet.of_size(sigma)
        text = datagen.generate_text(n, ab, seed=1)
        for p_size in args.p_sizes:
            pt = PhaseTimer()
            with pt.phase("gen"):
                pats = datagen.generate_patterns(
                    text, p_size, args.m, ab, frac_present=0.5, seed=2)
            import jax.numpy as jnp
            tdev = jax.device_put(jnp.asarray(text))
            counts = {}
            for eng_name in args.engines:
                try:
                    with pt.phase(f"build_{eng_name}"):
                        eng = (make_fast(pats) if eng_name == "fast"
                               else make_engine(eng_name, pats))
                    t0 = time.perf_counter()
                    c = eng.count(tdev)
                    t_first = time.perf_counter() - t0
                    times = []
                    for _ in range(args.reps):
                        t0 = time.perf_counter()
                        c = eng.count(tdev)
                        times.append(time.perf_counter() - t0)
                    best = min(times)
                    # device (steady-state) rate, round 5: q back-to-back
                    # scans inside ONE jitted fori-loop dispatch
                    # (fast.make_repeat) — no host work between scans, so
                    # the rate cannot be corrupted by dispatch timing.  The
                    # r4 queued-subtraction methodology swung the sub-11 MB
                    # cells ~60% between sessions (BENCHMARKS.md); paired
                    # (t(q) - t(1)) / (q - 1) with a >= ~0.35 s device
                    # window holds every cell to a few percent.
                    rep = getattr(eng, "count_repeat_async", None)
                    if rep is None:
                        from tpu_smatcher.ops.common import active_fastpath
                        fp = active_fastpath(eng)
                        rep = fp.count_repeat_async if fp is not None else None
                    best_dev, spread, q = best, None, 0
                    try:
                        if rep is None:
                            raise OverflowError("no repeat-capable path")

                        def measure(q):
                            rep(tdev, q).result()         # compile q variant
                            dts = []
                            for _ in range(args.reps):
                                t0 = time.perf_counter()
                                rep(tdev, q).result()
                                tq = time.perf_counter() - t0
                                t0 = time.perf_counter()
                                rep(tdev, 1).result()
                                t1 = time.perf_counter() - t0
                                dts.append((tq - t1) / (q - 1))
                            dts.sort()
                            med = dts[len(dts) // 2]
                            sp = (round((dts[-1] - dts[0]) / med, 4)
                                  if med > 0 else None)
                            return med, sp

                        rep(tdev, 1).result()             # warm/compile
                        t1s = []
                        for _ in range(2):
                            t0 = time.perf_counter()
                            rep(tdev, 1).result()
                            t1s.append(time.perf_counter() - t0)
                        # min of two: a single RTT spike must not shrink q
                        d_est = max(min(t1s) - 0.030, 1e-4)
                        # power-of-two q: each q compiles its own fori
                        # program, so quantizing makes repeat sessions hit
                        # the persistent compile cache
                        q = max(4, min(8192,
                                       1 << round(0.35 / d_est)
                                       .bit_length()))
                        best_dev, spread = measure(q)
                        if best_dev <= 0 or spread is None or spread > 0.5:
                            # sub-ms scans with a mis-sized q: escalate once
                            q = min(8192, q * 8)
                            best_dev, spread = measure(q)
                        if best_dev is None or best_dev <= 0:
                            best_dev, spread = best, None
                    except OverflowError:
                        # engine fast paths without adaptation state can
                        # overflow deterministically on match-dense cells
                        # (their count() falls back exactly, but the fused
                        # device loop is untimeable) — record the sync rate
                        best_dev, spread, q = best, None, 0
                    counts[eng_name] = int(c)
                    rec = {"corpus": name, "n": n, "sigma": sigma,
                           "m": args.m, "p_size": p_size, "engine": eng_name,
                           "matches": int(c), "scan_s": round(best, 5),
                           "first_scan_s": round(t_first, 4),
                           "bytes_per_s": round(n / best, 1),
                           "device_scan_s": round(best_dev, 6),
                           "device_bytes_per_s": round(n / best_dev, 1),
                           "queue": q, "spread": spread,
                           "method": "fori", "backend": backend}
                    emit_jsonl(args.out, rec)
                    print(f"  {name} p={p_size} {eng_name:5s} "
                          f"{c} matches  {n/best/1e9:.3f} GB/s "
                          f"(device {n/best_dev/1e9:.3f})",
                          file=sys.stderr)
                except Exception as e:     # keep sweeping; record the failure
                    emit_jsonl(args.out, {"corpus": name, "n": n,
                                          "sigma": sigma, "p_size": p_size,
                                          "engine": eng_name,
                                          "error": repr(e)})
                    print(f"  {name} p={p_size} {eng_name}: ERROR {e}",
                          file=sys.stderr)
            if len(set(counts.values())) > 1:
                print(f"  MISMATCH at {name} p={p_size}: {counts}",
                      file=sys.stderr)
                emit_jsonl(args.out, {"corpus": name, "p_size": p_size,
                                      "mismatch": counts})


if __name__ == "__main__":
    main()
