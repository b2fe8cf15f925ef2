"""Distributed scans: shard_map + ICI halo exchange + psum reduction.

The reference's distribution is exactly four MPI collectives (SURVEY.md §2.2):
Scatterv of the text with an (m-1)-byte halo per rank (main.c:467-489),
Bcast of the patterns (main.c:492), and two Reduces (count + timings,
main.c:654-661).  Here:

  - the text lives sharded on a 1-D mesh ('data' axis);
  - each device pulls its (m-1)-byte halo from its right neighbor with a
    single cyclic `lax.ppermute` over ICI (the last shard's halo is replaced
    by the out-of-alphabet pad, since it has no right neighbor);
  - tables are replicated (closed over in the shard_map body);
  - every device scans its shard + halo with any engine core and the global
    count is one `lax.psum`.

Exactness: device i owns window starts [i*per, (i+1)*per); a window starting
in shard i ends within shard i + its halo, and every start belongs to exactly
one shard — the same partition argument as the reference's rank decomposition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_smatcher.parallel.mesh import DATA_AXIS, make_mesh, shard_text


class DistributedCounter:
    """Wrap a single-device traceable count core into a mesh-distributed one.

    core_fn(local_text_with_halo) -> int32 count over starts
    [0, len - m + 1) of its argument, or (count, overflow) — the overflow
    flag (candidate-cap truncation in the sparse-verify paths) rides the
    psum so a distributed scan raises instead of silently undercounting.
    Must be shard_map-traceable.
    """

    def __init__(self, core_fn, mesh, *, m: int, sigma: int, axis: str = DATA_AXIS):
        if sigma >= 256:
            raise ValueError(
                "distributed scans need an out-of-alphabet uint8 pad symbol; "
                "sigma must be <= 255")
        self.mesh = mesh
        self.m = m
        self.sigma = sigma
        self.axis = axis
        k = mesh.shape[axis]
        halo = m - 1

        def local_count(local):                        # (per,) on each device
            ext = exchange_halo(local, axis=axis, k=k, halo=halo, sigma=sigma)
            res = core_fn(ext)
            c, o = res if isinstance(res, tuple) else (res, jnp.int32(0))
            return jax.lax.psum(jnp.stack([jnp.int32(c), jnp.int32(o)]), axis)

        # check_vma=False: engine cores initialize lax.scan carries with
        # fresh (unvarying) zeros, which is sound here — every device runs
        # the identical program on its own shard.
        self._fn = jax.jit(shard_map(
            local_count, mesh=mesh,
            in_specs=P(axis), out_specs=P(), check_vma=False))

    def count(self, text) -> int:
        """text: numpy array (host) or already-sharded device array."""
        import numpy as np
        if isinstance(text, np.ndarray):
            sharded, _ = shard_text(text, self.mesh, sigma=self.sigma, axis=self.axis)
        else:
            sharded = text
        from tpu_smatcher.ops.common import check_count32
        check_count32(int(sharded.shape[0]))
        per = sharded.shape[0] // self.mesh.shape[self.axis]
        if per < self.m - 1:
            raise ValueError(
                f"shard size {per} < m-1 = {self.m - 1}: the one-hop halo "
                "exchange cannot cover a window; use fewer devices or a "
                "longer text")
        co = np.asarray(self._fn(sharded))
        if co[1]:
            raise OverflowError(
                "candidate cap exceeded on some shard; raise cap=/row_slots=")
        return int(co[0])


def exchange_halo(local, *, axis: str, k: int, halo: int, sigma: int):
    """Append the right neighbor's first `halo` bytes to this shard (one
    cyclic ppermute over ICI); the last shard gets the out-of-alphabet pad."""
    if halo <= 0:
        return local
    edge = jax.lax.slice(local, (0,), (halo,))
    perm = [((i + 1) % k, i) for i in range(k)]
    recv = jax.lax.ppermute(edge, axis, perm)
    idx = jax.lax.axis_index(axis)
    recv = jnp.where(idx == k - 1, jnp.full((halo,), sigma, local.dtype), recv)
    return jnp.concatenate([local, recv])


class DistributedPositions:
    """Mesh-distributed match-position reporting over the shared fast path.

    Each device runs the mask kernel + hierarchical compaction (+ word
    verification on the fingerprint tier) on its own shard, converts local
    starts to global positions (device i owns starts [i*per, (i+1)*per)),
    and the per-device (cap,) position arrays concatenate along the mesh
    axis.  Per-device overflow flags are returned alongside (summed on the
    host, not psum-ed — see the comment in local_positions) and raise —
    never a truncated result.
    """

    def __init__(self, fast, mesh, *, axis: str = DATA_AXIS):
        from tpu_smatcher.ops import pallas_filter as pf
        from tpu_smatcher.ops.fast import (
            compact_mask, stages_for, verify_matched_at, words_len)
        ft = fast.ft
        if ft.sigma >= 256:
            raise ValueError("distributed scans need sigma <= 255")
        # the position pipeline is Pallas-only; off-TPU it must interpret
        interpret = bool(fast.interpret or jax.default_backend() != "tpu")
        self.mesh = mesh
        self.m = ft.m
        self.sigma = ft.sigma
        self.axis = axis
        k = mesh.shape[axis]
        halo = ft.m - 1

        def local_positions(local):               # (per,) per device
            per = local.shape[0]
            ext = exchange_halo(local, axis=axis, k=k, halo=halo,
                                sigma=ft.sigma)
            n = ext.shape[0]                      # static: per + m - 1
            if ft.exact:
                mask2d = pf.exact_mask_pallas(ext, ft.bitmaps[0], m=ft.m,
                                              sigma=ft.sigma, n=n,
                                              interpret=interpret)
                idxs, o = compact_mask(mask2d, caprows=fast.caprows,
                                       cap=fast.cap, row_slots=128)
                matched = idxs >= 0
            else:
                kst = stages_for(ft, n, fast.cap)
                mask2d = pf.filter_mask_pallas(ext, ft.bitmaps[:kst], m=ft.m,
                                               n=n, n_stages=kst,
                                               interpret=interpret)
                idxs, o = compact_mask(mask2d, caprows=fast.caprows,
                                       cap=fast.cap, row_slots=128)
                tw = pf.words_view_pallas(ext, nw=words_len(n, ft.words),
                                          interpret=interpret)
                matched = verify_matched_at(
                    tw, idxs, ft.bucket_ids, ft.packed, ft.bucket_fp2,
                    m=ft.m, words=ft.words, lmax=ft.lmax, eb=ft.eb,
                    n_starts=n - ft.m + 1, slot_ok=ft.slot_ok) & (idxs >= 0)
            base = jax.lax.axis_index(axis) * per
            pos = jnp.where(matched, idxs + base, -1)
            # overflow flags stay per-device (summed on host): an extra
            # all-reduce makes slow/straggling shards (e.g. interpret mode)
            # trip XLA's collective-rendezvous timeout
            return pos, jnp.reshape(jnp.int32(o), (1,))

        self._fn = jax.jit(shard_map(
            local_positions, mesh=mesh, in_specs=P(axis),
            out_specs=(P(axis), P(axis)), check_vma=False))

    def positions(self, text):
        import numpy as np
        if isinstance(text, np.ndarray):
            sharded, _ = shard_text(text, self.mesh, sigma=self.sigma,
                                    axis=self.axis)
        else:
            sharded = text
        pos, o = self._fn(sharded)
        pos = np.asarray(pos)
        if int(np.asarray(o).sum()):
            raise OverflowError(
                "candidate cap exceeded on some shard; raise cap=")
        return np.sort(pos[pos >= 0]).astype(np.int64)
