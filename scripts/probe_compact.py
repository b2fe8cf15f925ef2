"""Probe: compact_mask sub-part costs at production shape (R=2M, cap=32k)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_smatcher.ops.fast import ROW_SLOTS, nonzero_scatter


def steady(fn, reps=3, q=9):
    jax.block_until_ready(fn())
    fetch = lambda x: np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]
    best = None
    for _ in range(reps):
        t0 = time.time()
        rs = [fn() for _ in range(q)]
        fetch(rs[-1])
        t_many = time.time() - t0
        t0 = time.time()
        fetch(fn())
        t_one = time.time() - t0
        d = (t_many - t_one) / (q - 1)
        best = d if best is None else min(best, d)
    return best


def main():
    R, cap, row_slots = 1 << 21, 1 << 15, 8
    rng = np.random.default_rng(0)
    # ~16k candidates scattered like a real filter output
    mask = np.zeros((R, 128), np.int8)
    hits = rng.integers(0, R * 128, 16000)
    mask.reshape(-1)[hits] = 1
    mask2d = jax.device_put(jnp.asarray(mask))
    caprows = cap

    @jax.jit
    def part1(mask2d):
        row_counts = jnp.sum(mask2d.astype(jnp.int32), axis=1)
        return row_counts

    @jax.jit
    def part2(row_counts):
        return nonzero_scatter(row_counts > 0, caprows, R)

    @jax.jit
    def part3(mask2d, rows):
        rows_c = jnp.minimum(rows, R - 1)
        return jnp.take(mask2d, rows_c, axis=0).astype(jnp.int32)

    @jax.jit
    def part4(bits, rows):
        row_live = rows < R
        rows_c = jnp.minimum(rows, R - 1)
        cum = jnp.cumsum(bits, axis=1)
        count = cum[:, -1]
        slots, slot_valid = [], []
        for k in range(row_slots):
            lane_k = jnp.sum(cum < (k + 1), axis=1)
            slots.append(rows_c * 128 + jnp.minimum(lane_k, 127))
            slot_valid.append(row_live & (k < count))
        pos = jnp.stack(slots, 1).reshape(-1)
        pv = jnp.stack(slot_valid, 1).reshape(-1)
        sel = nonzero_scatter(pv, cap, pos.shape[0])
        sel_live = sel < pos.shape[0]
        return jnp.where(sel_live, pos[jnp.minimum(sel, pos.shape[0] - 1)], -1)

    rc = jax.block_until_ready(part1(mask2d))
    rows = jax.block_until_ready(part2(rc))
    bits = jax.block_until_ready(part3(mask2d, rows))

    print(f"part1 row_counts:   {steady(lambda: part1(mask2d))*1e3:.2f} ms",
          flush=True)
    print(f"part2 rows scatter: {steady(lambda: part2(rc))*1e3:.2f} ms",
          flush=True)
    print(f"part3 take rows:    {steady(lambda: part3(mask2d, rows))*1e3:.2f} ms",
          flush=True)
    print(f"part4 slots+sel:    {steady(lambda: part4(bits, rows))*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
