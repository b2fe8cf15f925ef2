"""Can the MXU compute fingerprint keys exactly and faster than the VPU tree?

fp_s[l] = sum_i t[l+i] * M^i mod 2^16 == banded matmul row: t (rb,256) @ W (256,128)
with W[c,l] = M^(c-l) for c-l in [0,m).  Weights split into lo/hi bytes so all
bf16 values are integers <= 255 (exact); f32 accumulation exact below 2^24.
"""
import functools, time, sys
import jax, jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core import datagen
from tpu_smatcher.ops import pallas_filter as pf
from tpu_smatcher.ops.fast import FP_MULTS
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n = 1 << 27
m = 32
ab = Alphabet.protein()
text = datagen.generate_text(n, ab, seed=9)
tdev = jax.device_put(jnp.asarray(text))
rb = pf.FILTER_RB
LANES = 128

tile, n_starts = jax.jit(functools.partial(pf.overlap_rows, n=n, m=m, rb=rb))(tdev)
_ = int(tile[0, 0]); R = tile.shape[0]

def timeit(fn, *a, reps=8):
    v = int(jnp.asarray(fn(*a)).ravel()[0])
    t0=time.perf_counter(); rs=[fn(*a) for _ in range(reps)]; int(jnp.asarray(rs[-1]).ravel()[0]); t1=time.perf_counter()
    t0b=time.perf_counter(); r1=fn(*a); int(jnp.asarray(r1).ravel()[0]); t1b=time.perf_counter()
    return ((t1-t0)-(t1b-t0b))/(reps-1), v

K = 5  # stages
Ws = []
for s in range(K):
    W = np.zeros((256, 128), np.int64)
    for l in range(128):
        for i in range(m):
            W[l + i, l] = pow(FP_MULTS[s], i, 1 << 16)
    Ws.append((jnp.asarray((W & 0xFF).astype(np.float32), jnp.bfloat16),
               jnp.asarray((W >> 8).astype(np.float32), jnp.bfloat16)))

def kern_vpu(tile_ref, out_ref):
    t32 = tile_ref[:, :LANES + m - 1].astype(jnp.int32)
    acc = jnp.zeros((rb, LANES), jnp.int32)
    for s in range(K):
        acc = acc ^ pf._fp_keys_2d(t32, m, FP_MULTS[s])
    out_ref[0, 0] = acc.sum(dtype=jnp.int32)

def kern_mxu(tile_ref, *refs):
    out_ref = refs[-1]
    t_bf = tile_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    acc = jnp.zeros((rb, LANES), jnp.int32)
    for s in range(K):
        lo = jnp.dot(t_bf, refs[2*s][:], preferred_element_type=jnp.float32)
        hi = jnp.dot(t_bf, refs[2*s+1][:], preferred_element_type=jnp.float32)
        fp = (lo.astype(jnp.int32) + (hi.astype(jnp.int32) << 8)) & 0xFFFF
        acc = acc ^ fp
    out_ref[0, 0] = acc.sum(dtype=jnp.int32)

run_vpu = jax.jit(lambda tl: pl.pallas_call(
    kern_vpu, grid=(R // rb,),
    in_specs=[pl.BlockSpec((rb, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(tl))

wargs = [w for pair in Ws for w in pair]
run_mxu = jax.jit(lambda tl: pl.pallas_call(
    kern_mxu, grid=(R // rb,),
    in_specs=[pl.BlockSpec((rb, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    + [pl.BlockSpec((256, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)] * (2*K),
    out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(tl, *wargs))

try:
    tv, vv = timeit(run_vpu, tile)
    print(f"VPU tree keys x{K}: {tv*1e3:6.1f}ms checksum={vv}")
except Exception as e:
    print("VPU FAIL", str(e)[:200])
try:
    tm, vm = timeit(run_mxu, tile)
    print(f"MXU keys x{K}:      {tm*1e3:6.1f}ms checksum={vm} {'EXACT MATCH' if vm==vv else 'MISMATCH!'}")
except Exception as e:
    print("MXU FAIL", str(e)[:300])
