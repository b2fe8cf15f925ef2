"""Micro-probe: in-kernel per-row slot extraction + 8:1 lane repack — the
compaction primitive of the two-phase cascade (probe_cascade.py sized its
budget; this validates the Mosaic lowering and measures its cost).

Per (rb, 128) block:
  rank   = lane-exclusive prefix of cand (one TRIU matmul, MXU)
  lane_k = per-row lane of the k-th candidate (slots masked reductions)
  idx    = lane_k values placed at lane 16*(row%8)+k   (slots selects)
  packed = 8 grouped take_along_axis gathers per value array, reshaped
           (rb,128)->(rb/8,8,128), group j landing at lanes [16j,16j+16)

Checks exactness against numpy and times the kernel against a copy-only
baseline at a bench-like size.  Usage: python scripts/probe_rowpack.py
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SLOTS = 16


@functools.lru_cache(maxsize=None)
def _triu():
    return np.triu(np.ones((LANES, LANES), np.float32), k=1).astype(
        jnp.bfloat16)


def rowpack(cand, vals_list, triu_ref, rb):
    """cand (rb,128) int32 0/1; vals_list: int32 arrays to compact.
    Returns (packed list (rb/8,128), cnt (rb,1), any_overflow scalar)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rb, LANES), 0)
    cf = cand.astype(jnp.bfloat16)
    rank = jnp.dot(cf, triu_ref[:], preferred_element_type=jnp.float32
                   ).astype(jnp.int32)                       # (rb,128)
    cnt = jnp.sum(cand, axis=1, dtype=jnp.int32).reshape(rb, 1)
    rankv = jnp.where(cand > 0, rank, 999)
    lrel = lane - ((row & 7) << 4)       # slot lane in the packed row
    idx = jnp.zeros((rb, LANES), jnp.int32)
    for k in range(SLOTS):
        lane_k = jnp.sum(jnp.where(rankv == k, lane, 0), axis=1,
                         dtype=jnp.int32).reshape(rb, 1)
        idx = jnp.where(lrel == k, lane_k, idx)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (rb // 8, LANES), 1)
    grp = lane8 >> 4
    slot = lane8 & 15
    idx3 = idx.reshape(rb // 8, 8, LANES)
    cnt3 = jnp.broadcast_to(cnt, (rb, LANES)).reshape(rb // 8, 8, LANES)
    cntp = jnp.zeros((rb // 8, LANES), jnp.int32)
    for j in range(8):
        cntp = jnp.where(grp == j, cnt3[:, j, :], cntp)
    valid = slot < jnp.minimum(cntp, SLOTS)
    packed = []
    for v in vals_list:
        v3 = v.reshape(rb // 8, 8, LANES)
        acc = jnp.zeros((rb // 8, LANES), jnp.int32)
        for j in range(8):
            g = jnp.take_along_axis(v3[:, j, :], idx3[:, j, :], axis=1)
            acc = jnp.where(grp == j, g, acc)
        packed.append(jnp.where(valid, acc, -1))
    return packed, cnt, jnp.max(cnt)


def _kern(cand_ref, a_ref, b_ref, c_ref, triu_ref, oa, ob, oc, ovf, *, rb):
    packed, cnt, mx = rowpack(cand_ref[:], [a_ref[:], b_ref[:], c_ref[:]],
                              triu_ref, rb)
    oa[:] = packed[0]
    ob[:] = packed[1]
    oc[:] = packed[2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        ovf[0, 0] = 0

    ovf[0, 0] = jnp.maximum(ovf[0, 0], mx)


def _copy_kern(cand_ref, a_ref, b_ref, c_ref, triu_ref, oa, ob, oc, ovf, *,
               rb):
    s = (cand_ref[:] + a_ref[:] + b_ref[:] + c_ref[:]).reshape(
        rb // 8, 8, LANES)[:, 0, :]
    oa[:] = s
    ob[:] = s
    oc[:] = s

    @pl.when(pl.program_id(0) == 0)
    def _():
        ovf[0, 0] = 0


@functools.partial(jax.jit, static_argnames=("rb", "copy"))
def run(cand, a, b, c, rb=512, copy=False):
    R = cand.shape[0]
    triu = _triu()
    spec = lambda i: (i, 0)
    kern = functools.partial(_copy_kern if copy else _kern, rb=rb)
    return pl.pallas_call(
        kern,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec((rb, LANES), spec, memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)][:1],
        out_specs=[pl.BlockSpec((rb // 8, LANES), spec,
                                memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((R // 8, LANES), jnp.int32)] * 3
        + [jax.ShapeDtypeStruct((1, 1), jnp.int32)],
    )(cand, a, b, c, triu)


def ref_pack(cand, vals, R):
    outs = [np.full((R // 8, LANES), -1, np.int64) for _ in vals]
    for r in range(R):
        lanes = np.nonzero(cand[r])[0][:SLOTS]
        base = (r % 8) * 16
        for k, ln in enumerate(lanes):
            for o, v in zip(outs, vals):
                o[r // 8, base + k] = v[r, ln]
    return outs


def main():
    rng = np.random.default_rng(0)
    R, rb = 4096, 512
    cand = (rng.random((R, LANES)) < 0.04).astype(np.int32)
    cand[7, :] = 1                     # an overflowing row (cnt=128)
    a = rng.integers(0, 1 << 30, (R, LANES)).astype(np.int32)
    b = rng.integers(0, 1 << 30, (R, LANES)).astype(np.int32)
    c = rng.integers(0, 1 << 30, (R, LANES)).astype(np.int32)
    oa, ob, oc, ovf = run(*map(jnp.asarray, (cand, a, b, c)), rb=rb)
    ra, rbb, rc = ref_pack(cand, [a, b, c], R)
    for got, want, name in ((oa, ra, "a"), (ob, rbb, "b"), (oc, rc, "c")):
        got = np.asarray(got)
        ok = (got == want) | (want == -1)   # beyond-slot lanes unspecified?
        exact = (got == want).all()
        print(f"{name}: exact={exact}")
        assert exact, np.argwhere(got != want)[:8]
    print("ovf(max cnt) =", int(np.asarray(ovf)[0, 0]))
    assert int(np.asarray(ovf)[0, 0]) == 128

    # timing at bench scale: 2^27 positions = 1M rows
    Rbig = 1 << 20
    candb = jnp.asarray((rng.random((Rbig, LANES)) < 0.03).astype(np.int32))
    ab = jnp.asarray(rng.integers(0, 1 << 30, (Rbig, LANES)).astype(np.int32))
    for copy in (True, False):
        r = run(candb, ab, ab, ab, rb=rb, copy=copy)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        best = None
        for _ in range(5):
            t0 = time.time()
            r = run(candb, ab, ab, ab, rb=rb, copy=copy)
            int(np.asarray(r[3])[0, 0])
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"copy={copy}: {best*1e3:.2f} ms / 2^27 positions")


if __name__ == "__main__":
    main()
