"""Break down fast-path costs with trustworthy timing (int() sync, minus
measured dispatch overhead)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.engines import make_fast
from tpu_smatcher.ops import pallas_filter as pf

n = 1 << 26
ab = Alphabet.dna()
text = datagen.generate_text(n, ab, seed=1)
tdev = jax.device_put(jnp.asarray(text))

@jax.jit
def triv(x): return x + 1
int(triv(jnp.int32(0)))
t0 = time.time()
for _ in range(10): int(triv(jnp.int32(0)))
OVH = (time.time() - t0) / 10
print(f"overhead {OVH*1e3:.1f} ms", flush=True)

def t(name, fn, *args, reps=5, scalarize=lambda o: int(jnp.sum(o))):
    scalarize(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        s = scalarize(fn(*args))
    dt = max((time.time() - t0) / reps - OVH, 1e-9)
    print(f"{name:46s} {dt*1e3:9.2f} ms  {n/dt/1e9:8.2f} GB/s-of-text [{s}]", flush=True)
    return dt

# exact tier true rate
pats8 = datagen.generate_patterns(text, 1000, 8, ab, seed=2)
eng8 = make_fast(pats8, backend="pallas")
t("exact m=8 p=1k", lambda x: pf.exact_count_pallas(x, eng8.ft.bitmaps[0], m=8, sigma=4, n=n), tdev,
  scalarize=lambda o: int(o))

# filter mask true rate (m=16 p=1k, 2 stages)
pats16 = datagen.generate_patterns(text, 1000, 16, ab, seed=2)
eng16 = make_fast(pats16, backend="pallas")
ft = eng16.ft
mask = pf.filter_mask_pallas(tdev, ft.bitmaps, m=16, n=n, n_stages=ft.n_stages)
mask = jax.block_until_ready(mask)
t("filter mask m=16 x2", lambda x: pf.filter_mask_pallas(x, ft.bitmaps, m=16, n=n, n_stages=ft.n_stages), tdev)

# nonzero alone
CAP = 1 << 17
@jax.jit
def nz(mask):
    return jnp.nonzero(mask != 0, size=CAP, fill_value=mask.shape[0])[0]
t("nonzero(64M, cap=128k)", nz, mask, scalarize=lambda o: int(o[0]))

idxs = nz(mask)
idxs = jax.block_until_ready(idxs)

# sparse gathers alone: 16 dependent byte gathers at CAP indices
@jax.jit
def sparse_gathers(text, idxs):
    t32 = text.astype(jnp.int32)
    acc = jnp.zeros_like(idxs)
    for i in range(16):
        acc = acc + t32[idxs + i]
    return acc
t("16 sparse gathers @128k idxs", sparse_gathers, tdev, idxs)

# bucket loop alone
@jax.jit
def bucket_loop(idxs, fpdummy):
    matched = jnp.zeros(idxs.shape, bool)
    for l in range(ft.lmax):
        pid = ft.bucket_ids[fpdummy * ft.lmax + l]
        matched |= pid >= 0
    return matched
fpd = (idxs & 0xFFFF)
t(f"bucket loop lmax={ft.lmax} @128k", bucket_loop, idxs, fpd)

# packed compare alone
@jax.jit
def packed_cmp(idxs):
    pid = idxs % ft.packed.shape[0]
    eq = jnp.zeros(idxs.shape, jnp.int32)
    for w in range(ft.words):
        eq += ft.packed[pid, w]
    return eq
t(f"packed gather x{ft.words} @128k", packed_cmp, idxs)
