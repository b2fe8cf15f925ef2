"""Runnable optimization-ladder ablation — one command regenerates the
DESIGN.md decision-log numbers, rung by rung, per engine.

The reference ships kernel1..kernel5 per algorithm as comparable artifacts
(/root/reference/cuda/cuda_ac.cu:563,535,491,333,104 and profile.sh); the
TPU redesign's ladder has different rungs (the CUDA ones — texture cache,
smem tiles, uint4 loads, register accumulation — are compiler- or
layout-level givens here), so what is compared is each engine's actual
implementation stack:

  oracle   reference-semantics Python oracle (tpu_smatcher/oracles), on a
           small prefix — the correctness bottom rung
  numpy    vectorized numpy table scan (ops/numpy_ref), small prefix
  jnp      the portable XLA scan (engine with fastpath=False)
  engine   the per-engine Pallas stage pipeline (EngineFastPath)
  fast     the shared fast backend (ops/fast), pipelined via count_async

Usage: python scripts/ladder.py [--n BYTES] [--m M] [--p P] [--sigma S]
       [--engines ac,wm,...] [--out results/ladder.jsonl]
Rungs `engine` and `fast` need the TPU (skipped elsewhere); every rung is
count-parity-checked against datagen.count_matches.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, reps):
    fn()
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 26)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--p", type=int, default=1000)
    ap.add_argument("--sigma", type=int, default=4)
    ap.add_argument("--oracle-n", type=int, default=1 << 17)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--engines", default="ac,wm,sog8,sh,sbom")
    ap.add_argument("--out", default="results/ladder.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_smatcher.core.alphabet import Alphabet
    from tpu_smatcher.core import datagen
    from tpu_smatcher.engines import build_tables, make_engine, make_fast
    from tpu_smatcher.oracles.reference import ORACLES
    from tpu_smatcher.ops import numpy_ref
    from tpu_smatcher.ops.common import active_fastpath

    on_tpu = jax.default_backend() == "tpu"
    ab = Alphabet.of_size(args.sigma)
    text = datagen.generate_text(args.n, ab, seed=7)
    pats = datagen.generate_patterns(text, args.p, args.m, ab,
                                     frac_present=0.5, seed=8)
    small = text[:args.oracle_n]
    truth_small = datagen.count_matches(small, pats)
    ppre = text[:min(args.n, 1 << 22)]          # parity-check prefix
    truth_pre = datagen.count_matches(ppre, pats)
    tdev = jax.device_put(jnp.asarray(text)) if on_tpu else text

    rows = []

    def emit(engine, rung, nbytes, secs, count, expect):
        ok = count == expect
        row = {"engine": engine, "rung": rung, "bytes": nbytes,
               "seconds": round(secs, 5),
               "bytes_per_s": round(nbytes / secs, 1), "count": int(count),
               "parity": bool(ok)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if not ok:
            print(f"PARITY FAILURE {engine}/{rung}: {count} != {expect}",
                  file=sys.stderr)
            sys.exit(1)

    numpy_scans = {
        "ac": lambda tb: lambda t: numpy_ref.scan_ac_flat_np(t, tb["main"]),
        "wm": lambda tb: lambda t: numpy_ref.scan_wm_np(t, tb["main"], tb["verify"]),
        "sog8": lambda tb: lambda t: numpy_ref.scan_sog_np(t, tb["main"], tb["verify"]),
        "sh": lambda tb: lambda t: numpy_ref.scan_sh_np(t, tb["main"]),
        "sbom": lambda tb: lambda t: numpy_ref.scan_sbom_np(t, tb["main"], tb["verify"]),
    }

    for name in args.engines.split(","):
        # rung 1: reference-semantics oracle (pure python, small prefix)
        okey = "sog" if name.startswith("sog") else name
        orc = ORACLES.get(okey) or ORACLES.get(name)
        dt = timed(lambda: orc(small, pats.codes, pats.sigma), 1)
        emit(name, "oracle", len(small), dt,
             orc(small, pats.codes, pats.sigma), truth_small)

        # rung 2: vectorized numpy table scan (small prefix)
        tb = build_tables(name, pats)
        scan = numpy_scans[name](tb)
        dt = timed(lambda: scan(small), args.reps)
        emit(name, "numpy", len(small), dt, scan(small), truth_small)

        # rung 3: portable jnp/XLA scan (full corpus on TPU, prefix on CPU)
        eng = make_engine(name, pats, fastpath=False)
        t3 = tdev if on_tpu else small
        n3 = args.n if on_tpu else len(small)
        dt = timed(lambda: eng.count(t3), args.reps)
        emit(name, "jnp", n3, dt, eng.count(ppre), truth_pre)

        # rung 4: per-engine Pallas stage pipeline (TPU only); the
        # "engine" rung is sync-included (one host RTT per scan), the
        # "engine-pipelined" rung is the production steady state
        if on_tpu:
            eng4 = make_engine(name, pats)
            fp4 = active_fastpath(eng4)
            assert fp4 is not None
            dt = timed(lambda: eng4.count(tdev), args.reps)
            emit(name, "engine", args.n, dt, eng4.count(ppre), truth_pre)

            def eng_pipelined():
                fs = [fp4.count_async(tdev) for _ in range(5)]
                fs[-1].result()
            dt = timed(eng_pipelined, args.reps) / 5
            emit(name, "engine-pipelined", args.n, dt, eng4.count(ppre),
                 truth_pre)

    # rung 5: the shared fast backend, pipelined (TPU only)
    if on_tpu:
        fast = make_fast(pats)
        fast.count_async(tdev).result()
        def pipelined():
            fs = [fast.count_async(tdev) for _ in range(5)]
            fs[-1].result()
        dt = timed(pipelined, args.reps) / 5
        emit("fast", "fast-pipelined", args.n, dt,
             fast.count(jnp.asarray(ppre)), truth_pre)

    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
