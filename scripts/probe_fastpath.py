"""TPU throughput + correctness of the Pallas fast path."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.engines import make_fast

LOGN = int(os.environ.get("PROBE_LOGN", 26))
REPS = int(os.environ.get("PROBE_REPS", 3))

ab = Alphabet.dna()
n = 1 << LOGN
text = datagen.generate_text(n, ab, seed=1)
tdev = jax.device_put(jnp.asarray(text))

for m, p in ((8, 1000), (8, 10000), (16, 1000), (16, 10000), (32, 10000)):
    pats = datagen.generate_patterns(text, p, m, ab, seed=2)
    # ground truth on a small prefix for sanity (full-truth too slow on host)
    nn = 1 << 22
    truth_small = datagen.count_matches(text[:nn], pats)
    eng = make_fast(pats, backend="pallas")
    t0 = time.time()
    c_small, o = eng.count_with_overflow(tdev[:nn])
    t1 = time.time()
    ok = "OK" if c_small == truth_small else f"MISMATCH truth={truth_small}"
    # timed full runs
    c, o = eng.count_with_overflow(tdev)
    t0 = time.time()
    for _ in range(REPS):
        c, o = eng.count_with_overflow(tdev)
    dt = (time.time() - t0) / REPS
    tier = "exact" if eng.ft.exact else f"fp x{eng.ft.n_stages} lmax={eng.ft.lmax}"
    print(f"m={m:2d} p={p:6d} [{tier:16s}] count={c} ovf={o} "
          f"{dt*1e3:9.2f} ms  {n/dt/1e9:7.2f} GB/s  small:{ok}", flush=True)
