"""Amortized TPU timing of the Pallas fast path (async enqueue, block once)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.engines import make_fast
from tpu_smatcher.ops import pallas_filter as pf
from tpu_smatcher.ops.fast import sparse_verify

LOGN = int(os.environ.get("PROBE_LOGN", 26))
REPS = int(os.environ.get("PROBE_REPS", 20))
ab = Alphabet.dna()
n = 1 << LOGN
text = datagen.generate_text(n, ab, seed=1)
tdev = jax.device_put(jnp.asarray(text))


def amortized(fn, *args, reps=REPS):
    o = fn(*args)
    jax.block_until_ready(o)
    # launch many, block once; subtract nothing (per-call overhead amortizes
    # only if dispatch is async — verify by comparing to single-call time)
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / reps
    return dt, outs[-1]


for m, p in ((8, 1000), (8, 100000), (16, 1000), (16, 10000), (32, 10000)):
    pats = datagen.generate_patterns(text, p, m, ab, seed=2)
    eng = make_fast(pats, backend="pallas")
    ft = eng.ft
    if ft.exact:
        fn = lambda t: pf.exact_count_pallas(t, ft.bitmaps[0], m=ft.m, sigma=ft.sigma, n=n)
        dt, out = amortized(fn, tdev)
        print(f"m={m:2d} p={p:6d} exact    {dt*1e3:8.2f} ms  {n/dt/1e9:7.2f} GB/s  count={int(out)}", flush=True)
    else:
        fn1 = lambda t: pf.filter_mask_pallas(t, ft.bitmaps, m=ft.m, n=n, n_stages=ft.n_stages)
        dt1, mask = amortized(fn1, tdev)
        nc = int(jnp.sum(mask != 0))
        fn2 = lambda t, mk: sparse_verify(t, mk, ft.bucket_ids, ft.packed,
                                          m=ft.m, words=ft.words, lmax=ft.lmax, cap=1 << 17)
        dt2, out = amortized(fn2, tdev, mask)
        c, o = out
        tot = dt1 + dt2
        print(f"m={m:2d} p={p:6d} fp x{ft.n_stages} "
              f"filter {dt1*1e3:8.2f} ms  verify {dt2*1e3:8.2f} ms  "
              f"total {n/tot/1e9:7.2f} GB/s  cands={nc} count={int(c)} ovf={int(o)}", flush=True)
