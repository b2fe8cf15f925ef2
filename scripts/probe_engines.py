"""Quick TPU throughput probe for all engines (dev tool)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.engines import make_engine

def main():
    n = int(os.environ.get("PROBE_N", 1 << 24))
    m = int(os.environ.get("PROBE_M", 8))
    p = int(os.environ.get("PROBE_P", 1000))
    tile = int(os.environ.get("PROBE_TILE", 1 << 21))
    names = os.environ.get("PROBE_ENGINES", "sog8,wm,sh,sbom").split(",")
    ab = Alphabet.dna()
    text = datagen.generate_text(n, ab, seed=1)
    pats = datagen.generate_patterns(text, p, m, ab, seed=2)
    truth = datagen.count_matches(text, pats)
    print(f"n={n} m={m} p={p} truth={truth}", flush=True)
    tdev = jax.device_put(jnp.asarray(text))
    for name in names:
        kw = dict(tile=tile)
        if name.startswith("ac"):
            kw = dict(lanes=int(os.environ.get("PROBE_LANES", 65536)),
                      q=int(os.environ.get("PROBE_Q", 1)))
        t0 = time.time()
        eng = make_engine(name.split(":")[0], pats, **kw)
        t1 = time.time()
        c = eng.count(tdev)
        t2 = time.time()
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            c = eng.count(tdev)
        dt = (time.time() - t0) / reps
        ok = "OK" if c == truth else f"MISMATCH({c})"
        print(f"{name:6s} build {t1-t0:5.1f}s compile {t2-t1:6.1f}s "
              f"run {dt*1e3:9.2f} ms  {n/dt/1e9:7.3f} GB/s  {ok}", flush=True)

if __name__ == "__main__":
    main()
